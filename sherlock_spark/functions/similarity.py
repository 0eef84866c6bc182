"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; LSH-bucketed
(random hyperplane) variant as the scale path. Dot products run
JVM-side via ``zip_with``/``aggregate`` — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    cand = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cand_vec")
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    scored = qry.crossJoin(cand).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("query_vec"), F.col("cand_vec"))
            / (_norm(F.col("query_vec")) * _norm(F.col("cand_vec"))),
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


def hyperplane_lsh_candidates(
    embeddings: DataFrame,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucketing: sign pattern over ``n_planes``
    deterministic pseudo-random hyperplanes, split into bands; candidate
    pairs share a band bucket. Planes are derived from xxhash64 of
    (plane, dim) — reproducible without RNG state.
    """
    # deterministic hyperplanes as literal arrays
    import hashlib

    def plane_component(plane: int, component: int) -> float:
        digest = hashlib.md5(f"{plane}:{component}".encode()).digest()
        return (int.from_bytes(digest[:4], "big") / 2**31) - 1.0

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
    banded = embeddings.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.array(*buckets)).alias("band", "bucket"),
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
