"""Bucketed tables for shuffle-free (co-located) joins.

At 100 TB the dominant shuffles are repeated joins on the same keys
(triples x links x canonical map on conv_id / norm keys). Writing both
sides bucketed on the join key with the same bucket count lets Spark
plan a SortMergeJoin with NO Exchange — each task reads matching
buckets from both tables. This module is the thin, tested wrapper the
pipeline uses; on a cluster with a catalog the same calls target
Iceberg (``write.format("iceberg")`` with a bucket partition transform).

The plan property (no Exchange under the join) is pinned by
tests/test_bucketing.py, not just claimed.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key_cols: list[str],
    sort_cols: Optional[list[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``buckets`` must match across tables that will be joined — unequal
    bucket counts reintroduce a shuffle on one side.
    """
    writer = df.write.mode(mode).bucketBy(buckets, *key_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The result's
    physical plan contains no Exchange when both sides were written by
    ``write_bucketed`` with equal bucket counts on ``on``.
    """
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True when the physical plan repartitions data (shuffle exchange).
    Broadcast exchanges don't count — they replicate a small side, which
    is exactly what co-location is NOT needed for."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan
