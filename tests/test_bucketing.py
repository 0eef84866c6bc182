"""Bucketed co-located joins: equal-bucket tables join with NO Exchange
(the plan property, not just the API)."""

import pytest
from pyspark.sql import functions as F

from sherlock_spark.plans.bucketing import (
    colocated_join,
    plan_has_shuffle,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    location = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{location}'")
    yield "bdb"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_colocated_join_has_no_exchange(spark, bucket_db):
    triples = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50)).alias("conv_id"),
        F.col("id").alias("t_id"),
    )
    links = spark.range(500).select(
        F.concat(F.lit("c"), (F.col("id") % 50)).alias("conv_id"),
        F.col("id").alias("l_id"),
    )
    write_bucketed(triples, f"{bucket_db}.triples_b", 8, ["conv_id"], ["conv_id"])
    write_bucketed(links, f"{bucket_db}.links_b", 8, ["conv_id"], ["conv_id"])

    # force the sort-merge path: broadcast would hide the property
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, f"{bucket_db}.triples_b", f"{bucket_db}.links_b", ["conv_id"]
        )
        assert not plan_has_shuffle(joined), "bucketed join must not shuffle"
        # a plain (unbucketed) SMJ join of the same data DOES shuffle
        assert plan_has_shuffle(triples.join(links, "conv_id"))
        # correctness: same result either way
        assert joined.count() == triples.join(links, "conv_id").count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unequal_buckets_shuffle_one_side(spark, bucket_db):
    left = spark.range(100).select(
        (F.col("id") % 10).cast("string").alias("k"), F.col("id").alias("a")
    )
    right = spark.range(100).select(
        (F.col("id") % 10).cast("string").alias("k"), F.col("id").alias("b")
    )
    write_bucketed(left, f"{bucket_db}.left8", 8, ["k"])
    write_bucketed(right, f"{bucket_db}.right4", 4, ["k"])
    joined = colocated_join(spark, f"{bucket_db}.left8", f"{bucket_db}.right4", ["k"])
    # documents the failure mode the docstring warns about
    assert joined.count() == 1000
