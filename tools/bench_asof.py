"""As-of join at scale: union-and-sweep vs the naive range join.

Backs the scale claim in ``functions/asof.py``. Workload is the worst
realistic shape for the naive formulation (inequality join + per-left
max): most keys uniform, plus ONE hot key holding a large slice of
both sides — the naive plan's candidate set on that key is
|left_hot| x |right_hot| (quadratic), while the sweep's cost is
|left_hot| + |right_hot| (one sorted pass).

Protocol: the sweep runs at the full size; the naive range join runs at
a reduced size (``--naive-rows``) where its blow-up is still feasible,
and its output is compared row-for-row against the sweep on that same
subset (correctness cross-check between two independent formulations —
the same role DuckDB's native ASOF JOIN plays in the oracle gate).

Run: ``python tools/bench_asof.py [--left 10000000] [--right 1000000]``
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sherlock_spark.session import get_spark  # noqa: E402
from sherlock_spark.functions.asof import asof_join  # noqa: E402


def synth(spark, n_left: int, n_right: int, n_keys: int):
    """Deterministic two-sided event stream; ~10% of each side lands on
    hot key 0, the rest spread uniformly. Timestamps are xxhash-derived
    so the sweep's sort is not pre-satisfied by generation order."""

    def side(n, tag, hot_frac=0.1):
        n_hot = int(n * hot_frac)
        base = spark.range(n)
        key = F.when(F.col("id") < n_hot, F.lit(0)).otherwise(
            F.abs(F.xxhash64("id", F.lit(tag))) % n_keys
        )
        ts = F.abs(F.xxhash64("id", F.lit(tag + "ts"))) % 10_000_000
        return base.select(
            F.col("id").alias(f"{tag}_id"),
            key.cast("long").alias("k"),
            ts.cast("long").alias("t"),
        )

    return side(n_left, "l"), side(n_right, "r")


def naive(left, right):
    cand = left.join(
        right,
        (left.k == right.k) & (right.t <= left.t),
        "left",
    ).select(
        left.l_id, left.k, left.t, right.t.alias("rt"), right.r_id
    )
    best = cand.groupBy("l_id", "k", "t").agg(
        F.max(F.struct("rt", "r_id")).alias("m")
    )
    return best.select(
        "l_id", "k", "t",
        F.col("m.rt").alias("asof_t"),
        F.col("m.r_id").alias("asof_r_id"),
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--left", type=int, default=10_000_000)
    parser.add_argument("--right", type=int, default=1_000_000)
    parser.add_argument("--keys", type=int, default=100_000)
    parser.add_argument("--naive-rows", type=int, default=200_000)
    parser.add_argument("--cores", type=int, default=None)
    args = parser.parse_args()

    spark = get_spark("bench_asof", cores=args.cores)
    spark.range(1000).count()

    left, right = synth(spark, args.left, args.right, args.keys)
    left = left.localCheckpoint(eager=True)
    right = right.localCheckpoint(eager=True)

    t0 = time.time()
    swept = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        right_cols=["r_id"],
    )
    n_out = swept.count()
    sweep_wall = time.time() - t0

    # correctness + naive timing at reduced size (same hot-key shape)
    sl, sr = synth(spark, args.naive_rows, args.naive_rows // 10, args.keys)
    sl = sl.localCheckpoint(eager=True)
    sr = sr.localCheckpoint(eager=True)
    t0 = time.time()
    nv = naive(sl, sr).localCheckpoint(eager=True)
    nv.count()
    naive_wall = time.time() - t0
    t0 = time.time()
    sw = asof_join(
        sl, sr, on="k", left_ts="t", right_ts="t", right_cols=["r_id"]
    ).select(
        "l_id", "k", "t",
        F.col("asof_t"), F.col("asof_r_id"),
    ).localCheckpoint(eager=True)
    sw.count()
    sweep_small_wall = time.time() - t0
    # r_id tie winner: both formulations keep max (struct ordering), so
    # the compare is exact
    mismatches = (
        nv.withColumnRenamed("asof_t", "nt")
        .withColumnRenamed("asof_r_id", "nr")
        .join(sw, ["l_id", "k", "t"], "full")
        .filter(
            ~(
                F.col("nt").eqNullSafe(F.col("asof_t"))
                & F.col("nr").eqNullSafe(F.col("asof_r_id"))
            )
        )
        .count()
    )

    print(
        json.dumps(
            {
                "left_rows": args.left,
                "right_rows": args.right,
                "sweep_wall_sec": round(sweep_wall, 2),
                "sweep_rows_per_sec": int(args.left / sweep_wall),
                "out_rows": n_out,
                "small_rows": args.naive_rows,
                "naive_small_wall_sec": round(naive_wall, 2),
                "sweep_small_wall_sec": round(sweep_small_wall, 2),
                "naive_vs_sweep_mismatches": mismatches,
            }
        )
    )


if __name__ == "__main__":
    main()
