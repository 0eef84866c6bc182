"""Point-in-interval join: bucket decomposition vs a brute-force
reference on small inputs, including intervals spanning many buckets,
zero-length intervals, overlapping intervals (one row per containing
interval), per-key isolation, and the half-open end mode."""

from __future__ import annotations

from sherlock_spark.functions.interval import interval_join


def _run(spark, points, intervals, **kw):
    p = spark.createDataFrame(points, "pid long, k long, t long")
    iv = spark.createDataFrame(intervals, "iid long, k long, s long, e long")
    out = interval_join(
        p, iv, point_col="t", start_col="s", end_col="e", keys=["k"], **kw
    )
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def _brute(points, intervals, inclusive_end=True):
    out = []
    for pid, pk, t in points:
        for iid, ik, s, e in intervals:
            if pk != ik or t < s:
                continue
            if (t <= e) if inclusive_end else (t < e):
                out.append((pid, iid))
    return sorted(out)


def test_interval_join_matches_brute_force(spark):
    points = [(i, i % 2, 100 * i) for i in range(40)]
    intervals = [
        (1, 0, 0, 50),        # sub-bucket
        (2, 0, 0, 9000),      # spans many 3600-buckets
        (3, 1, 100, 100),     # zero-length, hits point exactly
        (4, 1, 3500, 3700),   # straddles a bucket boundary
        (5, 0, 3500, 3700),   # same span, other key
        (6, 1, 0, 9000),      # overlaps interval 3 -> two rows for t=100
    ]
    assert _run(spark, points, intervals, bucket_width=3600) == _brute(
        points, intervals
    )


def test_interval_join_half_open_end(spark):
    points = [(1, 0, 200)]
    intervals = [(1, 0, 100, 200), (2, 0, 200, 300)]
    assert _run(spark, points, intervals, inclusive_end=False) == [(1, 2)]
    assert _run(spark, points, intervals, inclusive_end=True) == [
        (1, 1),
        (1, 2),
    ]
