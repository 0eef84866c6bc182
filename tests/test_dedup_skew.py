"""Hot-bucket / hot-shingle bounding: a block of near-identical
documents must not create a quadratic stage when caps are set
(VERDICT round-1: unbounded band-bucket self-join).
"""

import pytest
from pyspark.sql import functions as F

from sherlock_spark.functions.dedup import (
    cap_buckets,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from sherlock_spark.functions.similarity import hyperplane_lsh_candidates


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """1,000 near-identical docs (one hot LSH bucket / hot shingles)
    plus a handful of distinct ones."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    hot = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base + " copy "), F.col("id") % 3).alias("text"),
    )
    cold = spark.range(1000, 1005).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("totally different text number "), F.col("id")).alias("text"),
    )
    return hot.unionByName(cold).cache()


def test_minhash_bucket_cap_bounds_pairs(skewed_docs):
    capped = minhash_lsh_candidates(skewed_docs, max_bucket_size=50)
    # every bucket containing the 1000-doc block exceeds the cap -> no
    # pair from the hot block survives (the ~500k quadratic rows are
    # gone); unrelated small-bucket collisions among the cold docs are
    # fine and expected
    rows = capped.collect()
    assert all(r.doc_a >= 1000 and r.doc_b >= 1000 for r in rows)
    assert len(rows) < 10
    # uncapped on a small slice still works (shape check, not scale)
    small = skewed_docs.filter(F.col("doc_id") < 20)
    assert minhash_lsh_candidates(small).count() > 0


def test_simhash_and_hyperplane_caps(spark, skewed_docs):
    assert simhash_candidates(skewed_docs, max_bucket_size=50).count() == 0
    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (i % 7).cast("float"),  # all identical vectors
        ).alias("embedding"),
    )
    assert (
        hyperplane_lsh_candidates(emb, max_bucket_size=100).count() == 0
    )
    assert hyperplane_lsh_candidates(emb.limit(5)).count() == 10  # 5C2


def test_ngram_shingle_df_cap(skewed_docs):
    # hot shingles excluded from blocking -> the 1000-doc block does not
    # explode; the distinct docs produce no >=0.8 pairs either way
    capped = ngram_jaccard_pairs(skewed_docs, threshold=0.8, max_shingle_df=50)
    assert capped.count() == 0


def test_minhash_verified_pairs_still_found_below_cap(spark):
    """Caps must not break the normal path: duplicates in small buckets
    are still found and exact-verified."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_dedup_pairs(docs, threshold=0.8, max_bucket_size=10).collect()
    assert [(p.doc_a, p.doc_b, p.jaccard) for p in pairs] == [(1, 2, 1.0)]
