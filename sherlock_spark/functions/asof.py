"""Generic as-of join — "for each left row, the latest right row at or
before it" — the temporal-join primitive (telemetry attribution, price
snapshots, slowly-changing joins). DuckDB/kdb expose it as a native
ASOF JOIN; Spark has no built-in, and the naive formulation
(inequality-range join + per-left-row max) is a cartesian blow-up on
hot keys.

Scale shape: union-and-sweep. Right rows and left rows are unioned into
one stream, shuffled ONCE on the join key, sorted within each key by
(timestamp, side) — rights before lefts on ties so "at or before" is
inclusive — and the most recent right row is carried forward with a
running ``last(..., ignoreNulls=True)`` window. Cost is one shuffle +
one in-partition sort, independent of match fan-out; a hot key costs
its row count, never its row count squared (what the range-join plan
degrades to). This is the same pattern Flink's temporal join uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Attach to every ``left`` row the ``right`` row with the greatest
    ``right_ts`` <= ``left_ts`` for the same ``on`` key (NULLs if none).

    ``right_cols`` defaults to every right column except the key and
    timestamp; each lands as ``{prefix}{col}``, plus
    ``{prefix}{right_ts}`` with the matched timestamp. Ties inside
    ``right`` on (key, right_ts) are resolved deterministically by
    keeping the row whose payload struct sorts LAST — callers needing a
    specific winner should pre-aggregate. Both sides are struct-packed
    before the union so arbitrary schemas (including shared column
    names) merge without collision.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    r_payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in right_cols]
    )
    # one row per (key, ts): keep the max payload so the carried value
    # is deterministic even with duplicate right timestamps
    r = (
        right.groupBy(F.col(on).alias("_k"), F.col(right_ts).alias("_t"))
        .agg(F.max(r_payload).alias("_p"))
        .select("_k", "_t", F.lit(0).alias("_side"), "_p")
    )
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        l_payload.alias("_lp"),
    )
    merged = r.withColumn(
        "_lp", F.lit(None).cast(l.schema["_lp"].dataType)
    ).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_m", F.last("_p", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    return carried.select(
        *[F.col("_lp").getField(c).alias(c) for c in left.columns],
        F.col("_m").getField("_ts").alias(f"{prefix}{right_ts}"),
        *[F.col("_m").getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )
