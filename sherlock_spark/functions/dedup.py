"""Document deduplication: exact, n-gram Jaccard, MinHash-LSH, SimHash.

All operators work on a ``documents(doc_id, text)``-shaped DataFrame and
return flat, deterministic outputs. Exact and n-gram Jaccard have
closed-form SQL oracles; MinHash/SimHash are the approximate scale
paths (candidate generation without the quadratic join) and are checked
by property tests (recall vs the exact result) rather than value-hash.

Scale shape:
- exact: one hash-groupBy shuffle on md5(text);
- n-gram Jaccard: shingle explode -> shared-shingle blocking join ->
  exact Jaccard filter. Exact (a pair with J>0 must share a shingle)
  but quadratic in the worst case — the production path for near-dup at
  100 TB is MinHash-LSH below, which replaces the blocking join with a
  band-bucket join of fixed fanout;
- MinHash: k INDEPENDENT seeded hashes h_i(s) = xxhash64(s, i)
  (JVM-side, evaluated row-locally over each document's shingle array —
  no explode/groupBy; the affine-permutation family was removed in
  round 5 for correlated misses), bands of r rows hashed to buckets,
  candidates = pairs sharing a band bucket;
- SimHash: 64-bit sign-aggregated word hashes; near-dups share most
  bits, candidates via b-bit band equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sherlock_spark.functions.spread import spread

# -- exact ---------------------------------------------------------------


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups: (text_hash, n_dups, canonical_doc_id).
    Canonical = min doc_id (reference dedup-by-guid analogue,
    ``predict_documents.py:80-82``).
    """
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


# -- word n-gram shingles + exact Jaccard --------------------------------


def word_shingle_array(text_col=None, n: int = 3):
    """Column: the distinct word n-gram (shingle) array of ``text_col``.
    A document shorter than ``n`` words contributes its whole text as
    one (truncated) shingle."""
    words = F.split(text_col if text_col is not None else F.col("text"), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def word_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document."""
    return spread(documents).select(
        "doc_id", F.explode(word_shingle_array(F.col("text"), n)).alias("shingle")
    )


def word_shingle_sets(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingles array<string>, n_shingles) — each document's
    distinct shingle SET as one array row. The set form keeps
    per-document shingles together, so downstream exact-Jaccard
    verification is one row-local ``array_intersect`` per candidate
    pair instead of an exploded (doc, shingle) join + count aggregate
    (guide §2.3: shuffle candidate-pair rows, not candidate x shingle
    rows)."""
    return spread(documents).select(
        "doc_id", word_shingle_array(F.col("text"), n).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact near-duplicate pairs by word-n-gram Jaccard >= threshold.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded
    to 4 decimals. Blocking join on shared shingles keeps it exact while
    avoiding the full cross join.

    ``max_shingle_df`` bounds the blocking join's worst case: a shingle
    appearing in d documents contributes d² join rows, so hot shingles
    (stopword trigrams) make the join quadratic in corpus size. With the
    cap, shingles whose document frequency exceeds it are excluded from
    BLOCKING only (intersection counts drop with them, so reported
    jaccard is a lower bound and recall is no longer exact — pairs whose
    every shared shingle is hot are missed). The exact quadratic mode is
    the oracle-gated default; at 100 TB set a cap or use MinHash-LSH.
    """
    shingles = word_shingles(documents, n).cache()
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))

    blocking = shingles
    if max_shingle_df is not None:
        doc_freq = shingles.groupBy("shingle").agg(F.count("*").alias("df"))
        blocking = (
            shingles.join(doc_freq, "shingle")
            .filter(F.col("df") <= max_shingle_df)
            .select("doc_id", "shingle")
        )

    left = blocking.alias("l")
    right = blocking.alias("r")
    inter = (
        left.join(right, F.col("l.shingle") == F.col("r.shingle"))
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    size_a = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a")
    )
    size_b = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b")
    )
    return (
        inter.join(size_a, "doc_a")
        .join(size_b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# -- MinHash-LSH ---------------------------------------------------------

# 2^31-1: keeps a_i * h + b_i far below int64 overflow in ANSI mode
_MERSENNE = (1 << 31) - 1


def cap_buckets(
    banded: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket_size`` (hot-bucket
    bound). A bucket holding k near-identical docs emits k² candidate
    pairs in the self-join — unbounded without a cap. Oversized buckets
    are removed WHOLE (their members usually co-occur in other, smaller
    band buckets; for dedup the duplicates inside a mega-bucket are
    better handled by grouping on the bucket id than by pair explosion).
    Pass None for the exact (uncapped) mode used by the oracle queries.
    """
    if max_bucket_size is None:
        return banded
    counts = banded.groupBy("band", "bucket").agg(
        F.count("*").alias("bucket_size")
    )
    return (
        banded.join(counts, ["band", "bucket"])
        .filter(F.col("bucket_size") <= max_bucket_size)
        .select(*banded.columns)
    )


def minhash_signatures(documents: DataFrame, n_hashes: int = 32, shingle_n: int = 3) -> DataFrame:
    """(doc_id, signature array<long>) via ``n_hashes`` INDEPENDENT
    seeded hashes: h_i(shingle) = xxhash64(shingle, i). Deterministic.

    Round-5 scale catch: this originally used affine permutations of a
    single base hash, h_i = ((2i+1)*h + b_i) mod (2^31 - 1). With
    multipliers that small each map wraps the modulus at most 63 times,
    so it is piecewise MONOTONIC in h — all 32 "permutations" tended to
    pick the same argmin shingle, collapsing the family's effective
    independence. Recall still measured 1.000 at sf0.1, but the sf1
    robustness gate caught the failure shape exactly: documents whose
    single argmin shingle was a unique token missed ALL their
    neighbors at once (90 correlated misses out of 249,142 exact
    pairs), where independent per-band misses at J >= 0.83 have
    probability ~6e-9. Per-hash independence restores the textbook
    banding guarantee; cost is 32 JVM hash calls per shingle row
    instead of 1 + affine arithmetic — negligible next to the
    candidate join it feeds.
    """
    # Row-local evaluation: the signature is a pure function of one
    # document's shingle set, so it is computed as ``n_hashes``
    # array_min(transform(...)) expressions over the per-row shingle
    # array — no shingle explode, no groupBy, no exchange. (The
    # previous shape exploded to a (doc_id, shingle) table and ran 32
    # min-aggregates through a hash-aggregate exchange; same values,
    # one avoidable shuffle + agg machinery more.) The shingle array is
    # referenced 32 times but built once per row: CollapseProject does
    # not inline non-cheap expressions with multiple consumers, so the
    # two-Project shape below evaluates it once.
    with_shingles = spread(documents).select(
        "doc_id", word_shingle_array(F.col("text"), shingle_n).alias("shingles")
    )
    return with_shingles.select(
        "doc_id",
        F.array(
            *[
                F.array_min(
                    F.transform("shingles", lambda s: F.xxhash64(s, F.lit(i)))
                )
                for i in range(n_hashes)
            ]
        ).alias("signature"),
    )


def minhash_band_buckets(
    documents: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, band, bucket): the corpus's LSH band-bucket table —
    signatures split into ``bands`` buckets. This is the expensive,
    corpus-only part of the dedup (row-local 32-hash signatures); it
    depends on nothing but the corpus, so callers running
    repeated/incremental dedup materialize it once (stage registry /
    checkpoint table) and re-join against it.

    Bucket ids are ``xxhash64`` over the band's signature slice — one
    LONG instead of the previous md5 hex string (round-6: narrower
    join keys and a smaller staged table; candidate self-join measured
    1.15 s vs 1.73 s at sf1 with an identical candidate set). The
    bucket id is an arbitrary deterministic function of the slice:
    equal slices always collide (recall preserved by construction), and
    a cross-slice hash collision can only ADD candidate pairs, which
    the exact-Jaccard verify then filters — with the caveat that under
    ``max_bucket_size`` capping a collision-merged bucket could exceed
    the cap where the true buckets would not (measure-zero at 64-bit).
    """
    rows_per_band = n_hashes // bands
    signatures = minhash_signatures(documents, n_hashes, shingle_n)
    return signatures.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col("signature")[band * rows_per_band + row]
                            for row in range(rows_per_band)
                        ]
                    )
                    for band in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def minhash_lsh_candidates(
    documents: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    band_buckets: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >= 1 LSH band bucket.
    rows-per-band r = n_hashes / bands; P(candidate) = 1-(1-J^r)^bands.
    ``max_bucket_size`` bounds hot-bucket pair blowup (see cap_buckets).
    ``band_buckets`` injects a precomputed (materialized) bucket table.
    """
    banded = (
        band_buckets
        if band_buckets is not None
        else minhash_band_buckets(documents, n_hashes, bands, shingle_n)
    )
    banded = cap_buckets(banded, max_bucket_size)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    band_buckets: DataFrame | None = None,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard — the scale path for
    near-dup detection (candidate fanout bounded by band buckets, not by
    shared-shingle frequency; hot buckets additionally bounded by
    ``max_bucket_size``). ``band_buckets``/``shingle_sets`` inject
    precomputed corpus-only tables (incremental/repeated dedup reuses
    both; only the candidate join + verify re-run).

    Verification is SET-shaped (round-6): each candidate pair attaches
    the two documents' shingle arrays (``word_shingle_sets``) with two
    joins keyed on doc id, and the exact intersection size is one
    row-local ``array_intersect`` — the joins move O(candidate-pair)
    rows. The previous exploded shape joined candidates against a
    (doc_id, shingle) table twice and counted matches, flowing
    O(candidate-pairs x shingles-per-doc) rows (~30M at sf1 vs ~250k
    pairs) through the probe + aggregate. Values are identical: the
    arrays are distinct sets, so |array_intersect| equals the exploded
    match count.
    """
    candidates = minhash_lsh_candidates(
        documents, n_hashes, bands, shingle_n, max_bucket_size, band_buckets
    )
    if shingle_sets is None:
        shingle_sets = word_shingle_sets(documents, shingle_n)
    sets_a = shingle_sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("size_a"),
    )
    sets_b = shingle_sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("size_b"),
    )
    paired = candidates.join(sets_a, "doc_a").join(sets_b, "doc_b")
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        paired.withColumn(
            "jaccard",
            F.round(
                n_common
                / (F.col("size_a") + F.col("size_b") - n_common),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# -- SimHash -------------------------------------------------------------


def _simhash_assemble(documents: DataFrame, bit_of, bits: int) -> DataFrame:
    """Shared SimHash core: explode words, per-bit sign sums
    (+1 if the word's bit is set, -1 otherwise), majority vote per bit,
    fingerprint assembly. ``bit_of(i)`` yields the 0/1 Column for bit
    ``i`` of the current ``word`` column — the only thing the fast and
    the portable variants differ in."""
    words = spread(documents).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    bit_sums = words.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit_of(i) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    fingerprint = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        shifted = bit * F.lit(2**i if i < 63 else -(2**63)).cast("long")
        fingerprint = shifted if fingerprint is None else (fingerprint + shifted)
    return bit_sums.select("doc_id", fingerprint.alias("simhash"))


def simhash(documents: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash long): sign-sum of per-word xxhash64 bits.
    Near-duplicate texts differ in few bits (Hamming distance). The
    production path — xxhash64 is one JVM intrinsic per word."""
    h = F.xxhash64("word")
    return _simhash_assemble(
        documents,
        lambda i: F.shiftright(h, i).bitwiseAND(F.lit(1)),
        bits,
    )


def simhash_portable(documents: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash whose word-bit function is replayable in ANSI SQL (the
    oracle twin of ``simhash``): bit i of word w = first decimal digit
    of md5(w || ':' || i) mod 2 — the same engine-neutral trick as
    ``model_stub.md5_digit_bucket``. ``bits`` md5 calls per word, so
    this is the GATE configuration, not the scale path; the sign-sum /
    majority / assembly core is the exact same code as the fast
    variant."""
    def bit_of(i: int):
        stripped = F.regexp_replace(
            F.md5(F.concat(F.col("word"), F.lit(f":{i}"))), "[a-f]", ""
        )
        return F.substring(F.concat(stripped, F.lit("0")), 1, 1).cast(
            "int"
        ) % 2

    return _simhash_assemble(documents, bit_of, bits)


def simhash_candidates(
    documents: DataFrame,
    band_bits: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup candidates: equal SimHash bands (64/band_bits blocks).
    ``max_bucket_size`` bounds hot-bucket pair blowup (see cap_buckets).
    """
    hashes = simhash(documents)
    n_bands = 64 // band_bits
    banded = hashes.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), band * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    for band in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    banded = cap_buckets(banded, max_bucket_size)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def embedding_cosine_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the LSH-bucketed scale
    path: candidate pairs come from shared hyperplane-sign band buckets
    (never all-pairs; one bucketing shuffle, per-pair work scales with
    bucket occupancy), then exact JVM-side cosine keeps pairs at
    ``cos >= threshold``. Output: (id_a, id_b, cos), cos rounded to 4
    decimals, id_a < id_b.

    ``max_bucket_size`` drops oversized buckets whole (hot-bucket
    pair-blowup bound; a bucket of B vectors contributes O(B²) pairs).
    Recall/cost trade the same way as the text MinHash path: more
    bands -> higher recall, more candidate pairs to verify.
    """
    from sherlock_spark.functions.similarity import (
        _dot,
        _norm,
        hyperplane_lsh_candidates,
    )

    cands = hyperplane_lsh_candidates(
        embeddings, n_planes, bands, dim, id_col, vec_col, max_bucket_size
    )
    # norms computed once per vector row before the joins (not per
    # candidate pair) — identical float expression, strictly less work
    vecs = embeddings.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vec"),
        _norm(F.col(vec_col)).alias("_norm"),
    )
    scored = (
        cands.join(
            vecs.select(
                F.col("_vid").alias("id_a"),
                F.col("_vec").alias("vec_a"),
                F.col("_norm").alias("norm_a"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("_vid").alias("id_b"),
                F.col("_vec").alias("vec_b"),
                F.col("_norm").alias("norm_b"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b")),
                4,
            ).alias("cos"),
        )
    )
    return scored.filter(F.col("cos") >= threshold)


# -- exact duplicated-substring spans ------------------------------------


def duplicated_substring_spans(
    documents: DataFrame, n: int = 8
) -> DataFrame:
    """Span-level exact duplication: every position where a document's
    ``n``-word shingle also occurs in at least one OTHER document —
    the ExactSubstr-style training-data contamination signal (span
    granularity, unlike the document-level Jaccard/MinHash family:
    boilerplate shared by otherwise-different documents surfaces here
    and nowhere else).

    Output: (doc_id, pos, n_docs) — word position of each duplicated
    shingle and how many distinct documents share it. Scale shape: one
    shuffle keyed on the shingle (positions ride along), one partial-agg
    count, join back on the shingle — no all-pairs anything; shingle
    frequency skew is bounded upstream by the corpus (a universal
    boilerplate shingle costs one hot reduce key, not a pair blowup).
    Documents shorter than ``n`` words contribute their whole text as
    one (truncated) shingle, matching ``word_shingles`` semantics.
    """
    words = F.split("text", " ")
    positioned = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.concat_ws(" ", F.slice(words, i + 1, n)).alias("shingle"),
        ),
    )
    occurrences = spread(documents).select(
        "doc_id", F.explode(positioned).alias("occ")
    ).select(
        "doc_id", F.col("occ.pos").alias("pos"), F.col("occ.shingle").alias("shingle")
    )
    shared = (
        occurrences.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    return occurrences.join(shared, "shingle").select(
        "doc_id", "pos", "n_docs"
    )


# -- near-dup cluster assignment -----------------------------------------


def dedup_clusters(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cluster-granularity dedup: (doc_id, cluster_id, is_kept).

    The verified duplicate-pair graph (``minhash_dedup_pairs`` /
    ``ngram_jaccard_pairs`` output) is clustered with the same
    connected-components operator that canonicalizes KG entities
    (``operators/canonicalize.py`` — pointer-jumping min-label,
    O(log diameter) shuffles); the kept representative is the minimum
    ``doc_id`` per cluster, singletons keep themselves. This is the
    keep-list a training-data pipeline actually consumes: duplicate
    PAIRS overcount (a 5-document cluster is 10 pairs) and are not
    actionable until transitively closed — "drop B because of A, drop
    C because of B" must not keep C when A survives.

    Node ids are zero-padded so the CC operator's lexicographic
    min-label equals the numeric min doc_id. Scale shape: the pair
    graph is tiny relative to the corpus (only near-dups), CC runs on
    it alone; the corpus join-back is one broadcast-or-shuffle join.
    """
    from sherlock_spark.operators.canonicalize import connected_components

    def _pad(col):
        return F.lpad(F.col(col).cast("string"), 20, "0")

    edges = pairs.select(_pad("doc_a").alias("src"), _pad("doc_b").alias("dst"))
    comp = connected_components(edges)
    return (
        documents.select("doc_id")
        .join(comp, _pad("doc_id") == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component").cast("long"), F.col("doc_id")).alias(
                "cluster_id"
            ),
        )
        .withColumn(
            "is_kept",
            (F.col("cluster_id") == F.col("doc_id")).cast("int"),
        )
    )


# -- benchmark decontamination -------------------------------------------


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = 5
) -> DataFrame:
    """Drop corpus documents sharing ANY word n-gram with a benchmark
    (eval-set) document — the standard pretraining decontamination pass
    (13-gram in the GPT-3/PaLM recipes; ``n`` is a knob because the
    synthetic corpus' documents are short).

    Scale shape: the benchmark is always tiny relative to the corpus
    (thousands of eval rows vs 100 TB), so its distinct shingle set is
    BROADCAST and the contamination test is a map-side semi-join on the
    corpus shingles — the corpus is scanned once, nothing shuffles it.
    The final anti-join keys on doc_id against the (small) contaminated
    id set, also broadcast-able.
    """
    bench_shingles = (
        word_shingles(benchmark, n).select("shingle").distinct()
    )
    contaminated = (
        word_shingles(corpus, n)
        .join(F.broadcast(bench_shingles), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return corpus.join(contaminated, "doc_id", "left_anti")


def ngram_jaccard_prefix_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard near-dup pairs via PREFIX FILTERING (the
    PPJoin/AllPairs family) — a provable-recall alternative to
    shared-shingle blocking and MinHash banding: order every document's
    shingles by global rarity (document frequency asc, shingle asc —
    one total order for the whole corpus), keep only each document's
    first ``|x| - ceil(t*|x|) + 1`` shingles as its PREFIX, and join on
    prefix shingles. Any pair with J >= t MUST share a prefix shingle
    under a common total order (the prefix-filter theorem), so recall
    is 1.0 BY CONSTRUCTION — not a property of the corpus, unlike the
    banding gates. Candidates are verified by exact Jaccard as usual.

    Scale shape: one df aggregation, one per-DOCUMENT rank window
    (partitioned by doc_id — never global), a candidate equi-join on
    the (rarity-skewed) prefix shingles — rare shingles carry tiny
    document lists, which is exactly why the rarest-first order is the
    right one — then the same intersect/verify aggregation as the
    exact path.
    """
    from pyspark.sql import Window

    shingles = word_shingles(documents, n)
    doc_freq = shingles.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = shingles.join(doc_freq, "shingle").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("df").asc(), F.col("shingle").asc()
            )
        ),
    )
    sizes = shingles.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles")
    )
    prefix_len = F.col("n_shingles") - F.ceil(
        F.lit(threshold) * F.col("n_shingles")
    ) + 1
    prefix = (
        ranked.join(sizes, "doc_id")
        .filter(F.col("rnk") <= prefix_len)
        .select("doc_id", "shingle")
    )
    cand = (
        prefix.alias("l")
        .join(prefix.alias("r"), "shingle")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    inter = (
        cand.join(
            shingles.select(F.col("doc_id").alias("doc_a"), "shingle"),
            "doc_a",
        )
        .join(
            shingles.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sized = (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n_shingles").alias("size_a"),
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n_shingles").alias("size_b"),
            ),
            "doc_b",
        )
    )
    jac = F.round(
        F.col("inter")
        / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        4,
    )
    return sized.withColumn("jaccard", jac).filter(
        F.col("jaccard") >= threshold
    ).select("doc_a", "doc_b", "jaccard")
