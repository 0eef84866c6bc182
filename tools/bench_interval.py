"""Point-in-interval join at scale: bucket decomposition vs the naive
containment join.

Backs the scale claim in ``functions/interval.py``. The naive
formulation (equi-join on the key + containment as a residual filter)
enumerates |points_k| x |intervals_k| candidates per key — quadratic on
a hot key. The bucket decomposition splits each key's time axis into
fixed-width buckets so a point only meets the intervals overlapping
its OWN bucket: candidates scale with per-bucket occupancy, not
per-key totals.

Protocol mirrors ``bench_asof.py``: the bucketed join runs at full
size; the naive join runs at a reduced size (``--naive-rows``) where
its blow-up is still feasible, and the two outputs are compared
row-for-row on that subset (correctness cross-check between two
independent formulations — the same role the plain inequality-join
oracle plays in the driver gate's ``rel_events_in_sessions`` row).

Run: ``python tools/bench_interval.py [--points 10000000]
[--intervals 1000000]``. Prints one JSON line.
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
from sherlock_spark.functions.interval import interval_join  # noqa: E402

HORIZON = 10_000_000
WIDTH = 3600  # bucket width; interval spans drawn ~U[0, 2*WIDTH]


def synth(spark, n_points: int, n_intervals: int, n_keys: int):
    """Deterministic hot-key workload: ~10% of each side on key 0, the
    rest uniform; timestamps xxhash-derived."""

    def keyed(n, tag):
        n_hot = int(n * 0.1)
        base = spark.range(n)
        key = F.when(F.col("id") < n_hot, F.lit(0)).otherwise(
            F.abs(F.xxhash64("id", F.lit(tag))) % n_keys
        )
        return base, key.cast("long")

    pb, pk = keyed(n_points, "p")
    points = pb.select(
        F.col("id").alias("pid"),
        pk.alias("k"),
        (F.abs(F.xxhash64("id", F.lit("pt"))) % HORIZON).cast("long").alias(
            "t"
        ),
    )
    ib, ik = keyed(n_intervals, "i")
    start = F.abs(F.xxhash64("id", F.lit("is"))) % HORIZON
    span = F.abs(F.xxhash64("id", F.lit("iw"))) % (2 * WIDTH)
    intervals = ib.select(
        F.col("id").alias("iid"),
        ik.alias("k"),
        start.cast("long").alias("s"),
        (start + span).cast("long").alias("e"),
    )
    return points, intervals


def naive(points, intervals):
    return points.join(
        intervals,
        (points.k == intervals.k)
        & (intervals.s <= points.t)
        & (points.t <= intervals.e),
    ).select(points.pid, points.k, points.t, intervals.iid)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=10_000_000)
    parser.add_argument("--intervals", type=int, default=1_000_000)
    parser.add_argument("--keys", type=int, default=100_000)
    parser.add_argument("--naive-rows", type=int, default=200_000)
    parser.add_argument("--cores", type=int, default=None)
    args = parser.parse_args()

    spark = get_spark("bench_interval", cores=args.cores)
    spark.range(1000).count()

    points, intervals = synth(spark, args.points, args.intervals, args.keys)
    points = points.localCheckpoint(eager=True)
    intervals = intervals.localCheckpoint(eager=True)

    t0 = time.time()
    joined = interval_join(
        points, intervals, point_col="t", start_col="s", end_col="e",
        keys=["k"], bucket_width=WIDTH,
    )
    n_out = joined.count()
    bucketed_wall = time.time() - t0

    # correctness + naive timing at reduced size (same hot-key shape)
    sp, si = synth(
        spark, args.naive_rows, max(args.naive_rows // 10, 1), args.keys
    )
    sp = sp.localCheckpoint(eager=True)
    si = si.localCheckpoint(eager=True)
    t0 = time.time()
    nv = naive(sp, si).localCheckpoint(eager=True)
    nv.count()
    naive_wall = time.time() - t0
    t0 = time.time()
    bk = (
        interval_join(
            sp, si, point_col="t", start_col="s", end_col="e", keys=["k"],
            bucket_width=WIDTH,
        )
        .select("pid", "k", "t", "iid")
        .localCheckpoint(eager=True)
    )
    bk.count()
    bucketed_small_wall = time.time() - t0
    mismatches = nv.exceptAll(bk).count() + bk.exceptAll(nv).count()

    print(
        json.dumps(
            {
                "points": args.points,
                "intervals": args.intervals,
                "keys": args.keys,
                "matches": n_out,
                "bucketed_wall_s": round(bucketed_wall, 2),
                "points_per_sec": round(args.points / bucketed_wall),
                "naive_rows": args.naive_rows,
                "naive_wall_s": round(naive_wall, 2),
                "bucketed_small_wall_s": round(bucketed_small_wall, 2),
                "naive_over_bucketed": round(
                    naive_wall / bucketed_small_wall, 2
                ),
                "mismatches": mismatches,
            }
        )
    )


if __name__ == "__main__":
    main()
