"""Text analysis + similarity-search operators."""

from pyspark.sql import functions as F

from sherlock_spark.functions.dedup import (
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)
from sherlock_spark.functions.similarity import (
    cosine_topk,
    hyperplane_lsh_candidates,
)
from sherlock_spark.functions.textstats import (
    fingerprint,
    language_id,
    quality_score,
    with_text_stats,
)


def test_language_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is in that house for now"),
            (2, "der hund ist nicht mit der katze und das haus"),
            (3, "le chat est dans la maison et les chiens pour"),
            (4, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in language_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_text_stats_and_quality(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    stats = with_text_stats(docs).first()
    assert stats.n_words == 9
    assert stats.n_tokens == 9
    assert abs(stats.stopword_ratio - 2 / 9) < 1e-3  # two "the"
    assert abs(stats.distinct_ratio - 8 / 9) < 1e-3
    scored = quality_score(with_text_stats(docs)).first()
    assert 0.0 <= scored.quality <= 1.0


def test_fingerprint_order_insensitive(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in fingerprint(docs).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_minhash_recall_vs_exact(spark):
    """Property: LSH-verified near-dup pairs == exact pairs on a corpus
    with clear duplicates (high-Jaccard pairs are caught by 8 bands of 4).
    """
    base = "w%d " * 30
    texts = []
    for i in range(10):
        words = [f"w{j}" for j in range(30)]
        texts.append((i, " ".join(words)))                     # identical x10
    for i in range(10, 20):
        words = [f"w{j}" for j in range(30)]
        words[i % 30] = f"u{i}"                                # 1-word variants
        texts.append((i, " ".join(words)))
    for i in range(20, 30):
        texts.append((i, " ".join(f"z{i}_{j}" for j in range(30))))  # unrelated
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_dedup_pairs(docs, threshold=0.8).collect()
    }
    assert lsh == exact
    assert len(exact) >= 45  # the 10 identical docs alone give C(10,2)


def test_simhash_identical_docs_collide(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
        "doc_id long, text string",
    )
    hashes = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert hashes[1] == hashes[2]
    assert hashes[1] != hashes[3]
    cands = {
        (r.doc_a, r.doc_b) for r in simhash_candidates(docs).collect()
    }
    assert (1, 2) in cands


def test_cosine_topk_and_lsh(spark):
    import math

    rows = []
    for i in range(20):
        vec = [0.0] * 8
        vec[i % 4] = 1.0
        vec[(i % 4 + 1) % 8] = 0.1 * (i % 3)
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    topk = cosine_topk(emb, emb.filter(F.col("vec_id") < 2), k=3)
    got = topk.collect()
    assert len(got) == 6
    for row in got:
        assert -1.0001 <= row.cos <= 1.0001
    # exact self-similar vectors rank first
    best = {r.query_id: r for r in topk.filter("cos >= 0.99").collect()}
    assert 0 in best or 1 in best

    cands = hyperplane_lsh_candidates(emb, n_planes=8, bands=2, dim=8)
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    # identical direction vectors must share all sign buckets
    assert (0, 4) in pairs or (0, 8) in pairs or (0, 12) in pairs


def test_embedding_cosine_dedup_finds_planted_clones(spark):
    """LSH-bucketed embedding near-dup: planted near-identical clones
    are found with cos ~ 1; unrelated random vectors are not paired;
    an aggressive bucket cap drops hot buckets whole (bounded work)."""
    import random

    from sherlock_spark.functions.dedup import embedding_cosine_dedup_pairs

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        vec = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((vid, vec))
    # clones of every 10th vector, tiny perturbation
    for vid in range(0, 40, 10):
        base = rows[vid][1]
        rows.append((1000 + vid, [v + 0.001 for v in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    pairs = embedding_cosine_dedup_pairs(
        df, threshold=0.95, n_planes=8, bands=4, dim=16
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert {(vid, 1000 + vid) for vid in range(0, 40, 10)} <= found
    assert all(r.cos >= 0.95 for r in pairs)
    # random 16-dim vectors essentially never hit cos >= 0.95
    assert all(r.id_b >= 1000 for r in pairs)

    # hot-bucket bound: cap of 1 drops every bucket with >= 2 members,
    # so no candidates survive
    capped = embedding_cosine_dedup_pairs(
        df, threshold=0.95, n_planes=8, bands=4, dim=16, max_bucket_size=1
    ).count()
    assert capped == 0


def test_decontaminate_broadcast_semi_join(spark):
    from sherlock_spark.functions.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta shared tail here"),
            (2, "completely different words with no overlap at all"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "prefix alpha beta gamma suffix"), (101, "short doc")],
        "doc_id long, text string",
    )
    # doc 1 shares the 3-gram "alpha beta gamma"; doc 3 and bench 101
    # are both SHORTER than n, so each shingles to its clipped whole
    # text "short doc" — an exact-duplicate-of-an-eval-doc, caught even
    # below the n-gram width
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()
    )
    assert kept == [2]


def test_stratified_sample_deterministic_and_rates(spark):
    from sherlock_spark.functions.textstats import stratified_sample

    rows = [(i, "en" if i % 2 == 0 else "zz") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    kept1 = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, {"en": 0.5}, default_rate=0.05
        ).collect()
    )
    kept2 = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, {"en": 0.5}, default_rate=0.05
        ).collect()
    )
    assert kept1 == kept2  # same rows every run — no RNG
    n_en = sum(1 for d in kept1 if d % 2 == 0)
    n_zz = len(kept1) - n_en
    # md5 is uniform: 1000 draws at p=0.5 -> ~3 sigma window
    assert 450 <= n_en <= 550
    assert 20 <= n_zz <= 90
    # rate 0 keeps nothing, rate 1 keeps everything
    assert stratified_sample(docs, {}, default_rate=0.0).count() == 0
    assert stratified_sample(docs, {}, default_rate=1.0).count() == 2000


def test_redact_pii_counts_and_text(spark):
    from sherlock_spark.functions.textstats import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "write to First.Last+tag@sub.example.org today"),
            (2, "call +1 555-123-4567 or 44 123-456-7890 now"),
            (3, "clean text with an @ but no address"),
            (4, "both a@b.com and +1 555-000-1111 here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["text"])
        for r in redact_pii(docs).collect()
    }
    assert got[1] == (1, 0, "write to <EMAIL> today")
    assert got[2] == (0, 2, "call <PHONE> or <PHONE> now")
    assert got[3] == (0, 0, "clean text with an @ but no address")
    assert got[4] == (1, 1, "both <EMAIL> and <PHONE> here")


def test_repetition_stats_closed_form(spark):
    from sherlock_spark.functions.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            # bigram "a b" occurs twice (6 of 9 chars); no dup 5-gram;
            # 3 distinct of 5 words
            (1, "a b a b c"),
            # every 5-gram window of the doubled phrase: "p q r s t"
            # occurs twice (18 of 19 chars); top bigram ties at cnt=2,
            # lexicographically smallest is "p q"
            (2, "p q r s t p q r s t"),
            # shorter than both n-gram sizes -> zero fractions
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["top2gram_frac"], r["dup5gram_frac"], r["dup_word_frac"]
        )
        for r in repetition_stats(docs).collect()
    }
    assert got[1] == (round(6 / 9, 4), 0.0, round(1 - 3 / 5, 4))
    assert got[2] == (round(6 / 19, 4), round(18 / 19, 4), 0.5)
    assert got[3] == (0.0, 0.0, 0.0)


def test_pack_chunks_closed_form(spark):
    from sherlock_spark.functions.packing import pack_chunks

    docs = spark.createDataFrame(
        [(1, 4), (2, 5), (3, 3), (4, 12), (5, 2), (6, 0)],
        "doc_id long, nt long",
    )
    got = {
        r["doc_id"]: (
            r["chunk_id"],
            r["chunk_offset"],
            r["n_boundary_crossings"],
        )
        for r in pack_chunks(
            docs, capacity=10, buckets=1, tokens=F.col("nt")
        ).collect()
    }
    # one stream, capacity 10: ends 4,9,12,24,26,26
    assert got[1] == (0, 0, 0)
    assert got[2] == (0, 4, 0)
    assert got[3] == (0, 9, 1)   # straddles the 10-token boundary
    assert got[4] == (1, 2, 1)   # 12 tokens crosses one boundary
    assert got[5] == (2, 4, 0)
    assert got[6] == (2, 6, 0)   # zero-token doc: placed, crosses nothing

    # two buckets pack independently: odd/even doc_ids each restart at 0
    by_bucket = {
        r["doc_id"]: (r["bucket"], r["chunk_id"], r["chunk_offset"])
        for r in pack_chunks(
            docs, capacity=10, buckets=2, tokens=F.col("nt")
        ).collect()
    }
    assert by_bucket[1] == (1, 0, 0)
    assert by_bucket[2] == (0, 0, 0)
    assert by_bucket[3] == (1, 0, 4)
    assert by_bucket[4] == (0, 0, 5)


def test_label_centroid_outliers_find_planted_mislabel(spark):
    from sherlock_spark.functions.similarity import label_centroid_outliers

    # label 0 clusters near +e0; vec 99 is an opposite-direction plant
    rows = [(i, [1.0, 0.1 * (i % 3), 0.0], 0) for i in range(6)]
    rows.append((99, [-1.0, 0.0, 0.0], 0))
    # a second label so the window partitioning is exercised
    rows += [(10 + i, [0.0, 1.0, 0.05 * i], 1) for i in range(4)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    got = label_centroid_outliers(emb, k=2).collect()
    by_label = {}
    for r in got:
        by_label.setdefault(r["label"], []).append((r["rank"], r["vec_id"]))
    assert sorted(by_label[0])[0] == (1, 99)  # the plant is rank 1
    assert len(by_label[0]) == 2 and len(by_label[1]) == 2


def test_prefix_filter_pairs_equal_blocking_pairs(spark):
    from sherlock_spark.functions.dedup import ngram_jaccard_prefix_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " today"),                # near-dup of 1
            (3, base.replace("quick", "slow")),  # moderate overlap
            (4, "completely different words entirely unrelated text here"),
            (5, base + " today"),                # exact dup of 2
        ],
        "doc_id long, text string",
    )
    blocking = sorted(
        map(tuple, ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect())
    )
    prefix = sorted(
        map(
            tuple,
            ngram_jaccard_prefix_pairs(docs, n=3, threshold=0.6).collect(),
        )
    )
    assert prefix == blocking
    assert any(p[:2] == (2, 5) for p in prefix)  # the planted dup pair
