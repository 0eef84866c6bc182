"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; LSH-bucketed
(random hyperplane) variant as the scale path. Dot products run
JVM-side via ``zip_with``/``aggregate`` — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sherlock_spark.functions.spread import spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos) — cos rounded to 4 decimals,
    ties broken by neighbor_id. The cross join is the baseline; at scale
    swap the candidate set for ``hyperplane_lsh_candidates``.
    """
    # Norms are per-VECTOR, not per-pair: compute them once on each
    # side before the cross join instead of re-aggregating the same
    # array k-queries (corpus side) / corpus-size (query side) times
    # inside the scored projection. Same float expression tree per
    # value (aggregate of squares, sqrt, multiplied query*cand), so the
    # rounded cosine is bit-identical; the per-pair work drops from
    # three array folds to one.
    cand = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cand_vec"),
        _norm(F.col(vec_col)).alias("cand_norm"),
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        _norm(F.col(vec_col)).alias("query_norm"),
    )
    scored = qry.crossJoin(cand).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("query_vec"), F.col("cand_vec"))
            / (F.col("query_norm") * F.col("cand_norm")),
            4,
        ).alias("cos"),
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def plane_component(plane: int, component: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5 of "plane:component" — reproducible on any engine (the DuckDB
    oracle recomputes the identical value from the hex digest)."""
    import hashlib

    digest = hashlib.md5(f"{plane}:{component}".encode()).digest()
    return (int.from_bytes(digest[:4], "big") / 2**31) - 1.0


def hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket): sign pattern over ``n_planes`` deterministic
    hyperplanes, split into ``bands`` bucket strings."""
    planes = [
        F.array(*[F.lit(plane_component(p, c)) for c in range(dim)])
        for p in range(n_planes)
    ]
    bits = [
        F.when(_dot(F.col(vec_col), plane) > 0, F.lit(1)).otherwise(F.lit(0))
        for plane in planes
    ]
    per_band = n_planes // bands
    buckets = [
        F.concat_ws(
            "", *[bits[band * per_band + i].cast("string") for i in range(per_band)]
        )
        for band in range(bands)
    ]
    return spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.array(*buckets)).alias("band", "bucket"),
    )


def hyperplane_lsh_candidates(
    embeddings: DataFrame,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing a band bucket. ``max_bucket_size`` drops
    oversized buckets whole (hot-bucket pair-blowup bound — see
    functions.dedup.cap_buckets)."""
    from sherlock_spark.functions.dedup import cap_buckets

    banded = cap_buckets(
        hyperplane_buckets(embeddings, n_planes, bands, dim, id_col, vec_col),
        max_bucket_size,
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )


def lsh_topk_cosine(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    corpus_buckets: DataFrame | None = None,
    query_buckets: DataFrame | None = None,
) -> DataFrame:
    """End-to-end approximate top-k: LSH band-bucket candidates ->
    exact cosine scoring -> top-k per query (ties by neighbor_id).

    The 100-TB shape: the corpus is bucketed once (one shuffle on the
    bucket key), each query probes only its own buckets — work scales
    with bucket occupancy instead of corpus size. Recall < 1 by design
    (a neighbor sharing no band bucket is invisible); raise bands or
    planes-per-band to trade cost for recall; ``cosine_topk`` is the
    exact baseline. Measured (tools/recall_study.py, sf0.1, table in
    BASELINE.md): NEAR-DUPLICATE recall (cos >= 0.99, the dedup use
    case) is >= 0.9975 at every studied setting; top-k recall over
    i.i.d.-RANDOM vectors (neighbors at cos ~0.3-0.5 — weak signal) is
    0.46 at 16 planes x 4 bands and 0.98 at 16 x 8 at ~4x the candidate
    pairs, so size bands to the similarity level the workload actually
    queries for.

    ``corpus_buckets``/``query_buckets``: pass a pre-materialized
    ``hyperplane_buckets`` output (id renamed to doc_id) to skip
    re-evaluating the plane signatures — the "bucket the corpus ONCE"
    path. Production keeps this table checkpointed (udfcache.stage /
    plans.checkpoint) and re-probes it per query batch; the signature
    cost is then paid once per corpus, not once per query run.
    """
    from sherlock_spark.functions.dedup import cap_buckets

    if corpus_buckets is None:
        corpus_buckets = hyperplane_buckets(
            embeddings, n_planes, bands, dim, id_col, vec_col
        )
    corpus_b = cap_buckets(corpus_buckets, max_bucket_size)
    if query_buckets is None:
        query_buckets = hyperplane_buckets(
            queries, n_planes, bands, dim, id_col, vec_col
        )
    query_b = query_buckets.select(
        F.col("doc_id").alias("query_id"), "band", "bucket"
    )
    candidates = (
        query_b.join(corpus_b, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("doc_id"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"))
        .distinct()
    )
    # norms computed once per vector row before the joins (not per
    # candidate pair) — identical float expression, strictly less work
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        _norm(F.col(vec_col)).alias("query_norm"),
    )
    cand = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cand_vec"),
        _norm(F.col(vec_col)).alias("cand_norm"),
    )
    scored = (
        candidates.join(qry, "query_id")
        .join(cand, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("query_vec"), F.col("cand_vec"))
                / (F.col("query_norm") * F.col("cand_norm")),
                4,
            ).alias("cos"),
        )
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


# -- IVF (inverted-file) ANN ---------------------------------------------
#
# The second scale path next to hyperplane LSH: partition the corpus
# into K coarse cells (nearest centroid), probe only the nprobe cells
# nearest each query. Work per query scales with nprobe/K of the
# corpus; the cell assignment is ONE narrow broadcast pass over the
# data (centroids are tiny). The oracle-gated configuration uses the
# deterministic coarse quantizer (first K corpus vectors by id) so the
# whole path — assignment, probe, exact re-rank — replays in ANSI SQL;
# ``ivf_centroids_kmeans`` refines centroids with Lloyd iterations for
# production quality (tests-gated: iterative averaging has no
# closed-form SQL twin).


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, cos) for each vector's ``nprobe`` nearest
    centroids (cosine; ties by centroid_id). Centroids broadcast — the
    scan stays narrow. CAVEAT (same class as the hyperplane-bucket
    gates): two centroids at float-association distance of a vector
    could assign differently across engines; measure-zero on real
    embeddings."""
    # per-vector norm computed once before the centroid cross join
    # (not once per centroid) — identical float expression, 1/K the folds
    scored = spread(vectors).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("vnorm"),
    ).crossJoin(
        F.broadcast(
            centroids.select(
                F.col("centroid_id"), F.col("cvec"),
                _norm(F.col("cvec")).alias("cnorm"),
            )
        )
    ).select(
        "vid",
        "centroid_id",
        (
            _dot(F.col("vec"), F.col("cvec"))
            / (F.col("vnorm") * F.col("cnorm"))
        ).alias("ccos"),
    )
    window = Window.partitionBy("vid").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(window))
        .filter(F.col("rnk") <= nprobe)
        .select("vid", "centroid_id")
    )


def ivf_centroids_deterministic(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the first ``n_centroids`` corpus
    vectors in id order — an ORDER BY/LIMIT, not ``id < K``, so
    id-sharded corpora whose ids don't start at 0 still yield K
    centroids. SQL-replayable (the oracle-gated configuration); for
    production recall, refine with ``ivf_centroids_kmeans``."""
    return (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
        )
    )


def ivf_centroids_kmeans(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-refined centroids: start from the deterministic quantizer,
    then ``iterations`` rounds of assign -> per-cell component-wise
    mean. Each round is one broadcast assignment pass + one groupBy —
    no Python, no per-row UDFs; the centroid table (K x dim doubles)
    localCheckpoints per round so the plan never compounds. Empty cells
    keep their previous centroid."""
    centroids = ivf_centroids_deterministic(
        embeddings, n_centroids, id_col, vec_col
    ).select(
        "centroid_id", F.transform("cvec", lambda x: x.cast("double")).alias("cvec")
    ).localCheckpoint(eager=True)

    for _ in range(iterations):
        assigned = ivf_assign(embeddings, centroids, 1, id_col, vec_col)
        means = (
            assigned.join(
                embeddings.select(
                    F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
                ),
                "vid",
            )
            .select(
                "centroid_id",
                F.posexplode(F.col("vec")).alias("comp", "val"),
            )
            .groupBy("centroid_id", "comp")
            .agg(F.avg(F.col("val").cast("double")).alias("mean"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("comp", "mean"))
                ).alias("pairs")
            )
            .select(
                "centroid_id",
                F.transform(F.col("pairs"), lambda p: p["mean"]).alias(
                    "new_cvec"
                ),
            )
        )
        centroids = centroids.join(means, "centroid_id", "left").select(
            "centroid_id",
            F.coalesce(F.col("new_cvec"), F.col("cvec")).alias("cvec"),
        ).localCheckpoint(eager=True)
    return centroids


def ivf_topk_cosine(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    corpus_assignment: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: assign corpus to nearest centroid,
    probe each query's ``nprobe`` nearest cells, exact cosine re-rank.

    Recall is MEASURED, not argued (``tools/recall_study.py`` at sf0.1,
    i.i.d.-random vectors — the hard case): 0.38 at nprobe 1/16 cells,
    0.62 at 4/16, **0.82 at 8/16 (the default and gate config)**, 0.66
    at 4/32; recall tracks the scanned corpus fraction
    (~nprobe/n_centroids) and more cells buys recall at fixed cost.
    Table in BASELINE.md. The default sits at the measured-good point
    of that curve (round-4 VERDICT #3): a caller at defaults gets
    recall >=0.8 on the hard i.i.d. case and >=0.99 on near-duplicate
    queries, at ~nprobe/n_centroids = 50% corpus scanned; drop nprobe
    for cheaper/lower-recall probes, raise n_centroids (with k-means
    refinement) to cut the scanned fraction at fixed recall.

    Output matches ``cosine_topk``: (query_id, neighbor_id, cos).
    ``centroids``/``corpus_assignment`` inject precomputed tables (the
    bucket-corpus-ONCE pattern — materialize via ``udfcache.stage`` or
    a checkpoint table and re-probe per query batch)."""
    if centroids is None:
        centroids = ivf_centroids_deterministic(
            embeddings, n_centroids, id_col, vec_col
        )
    if corpus_assignment is None:
        corpus_assignment = ivf_assign(embeddings, centroids, 1, id_col, vec_col)
    query_assignment = ivf_assign(queries, centroids, nprobe, id_col, vec_col)

    cand = (
        query_assignment.select(
            F.col("vid").alias("query_id"), "centroid_id"
        )
        .join(
            corpus_assignment.select(
                F.col("vid").alias("neighbor_id"), "centroid_id"
            ),
            "centroid_id",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # query vectors come from QUERIES (they need not be corpus members —
    # cosine_topk/lsh_topk_cosine accept external queries, so must this);
    # neighbor vectors come from the corpus
    scored = (
        cand.join(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qv"),
                _norm(F.col(vec_col)).alias("qn"),
            ),
            "query_id",
        )
        .join(
            embeddings.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("nv"),
                _norm(F.col(vec_col)).alias("nn"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("nv"))
                / (F.col("qn") * F.col("nn")),
                4,
            ).alias("cos"),
        )
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos")
    )


def label_centroid_outliers(
    embeddings: DataFrame, k: int = 5
) -> DataFrame:
    """Label-noise detection: for every class label, the ``k`` vectors
    LEAST similar (cosine) to their label's centroid — the standard
    mislabeled-example sweep over an embedded training set.

    Scale shape: component explode (posexplode, x dim rows) -> ONE
    partial-aggregatable hash agg for the centroids (labels x dim rows
    — tiny, broadcast into the join back) -> per-vector dot/norm agg ->
    per-LABEL window for the bottom-k (never global). The centroid's
    squared norm rides along the same join (each component row carries
    its centroid component), so no second pass. Cosine is rounded to 4
    BEFORE ranking so both engines rank an identical key (same
    convention as TF-IDF); residual ties break on vec_id.
    """
    comp = embeddings.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("comp", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    centroids = comp.groupBy("label", "comp").agg(F.avg("v").alias("c"))
    dots = (
        comp.join(F.broadcast(centroids), ["label", "comp"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"),
        )
    )
    cos = F.round(F.col("dot") / (F.col("nv") * F.col("nc")), 4)
    window = Window.partitionBy("label").orderBy(
        F.col("cos").asc(), F.col("vec_id").asc()
    )
    return (
        dots.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select(
            F.col("vec_id").cast("long"),
            F.col("label").cast("long"),
            "cos",
            F.col("rank").cast("long"),
        )
    )
