"""asof_join: union-and-sweep temporal join.

Pinned against hand-computed matches covering the tricky cases — the
inclusive tie (left ts == right ts matches), the no-prior-row NULL, a
key present only on the left, duplicate right timestamps (deterministic
max-payload winner), and column-name overlap between the two sides.
The plan is also checked for the scale contract: exactly ONE shuffle
(the window partitioning), no join operator at all.
"""

from __future__ import annotations

import datetime as dt

from sherlock_spark.functions.asof import asof_join

T = dt.datetime


def _sides(spark):
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10), 100),
            (1, T(2024, 1, 1, 12), 101),
            (2, T(2024, 1, 1, 11), 102),
            # duplicate ts on key 2 — winner must be max payload (103)
            (2, T(2024, 1, 1, 11), 103),
        ],
        "k int, ts timestamp, rid int",
    )
    left = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9), "before-any"),
            (1, T(2024, 1, 1, 10), "tie-inclusive"),
            (1, T(2024, 1, 1, 13), "after-last"),
            (2, T(2024, 1, 1, 11, 30), "dup-ts-winner"),
            (3, T(2024, 1, 1, 10), "no-right-key"),
        ],
        "k int, ts timestamp, name string",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    got = {r["name"]: (r["asof_ts"], r["asof_rid"]) for r in out.collect()}
    assert got["before-any"] == (None, None)
    assert got["tie-inclusive"] == (T(2024, 1, 1, 10), 100)
    assert got["after-last"] == (T(2024, 1, 1, 12), 101)
    assert got["dup-ts-winner"] == (T(2024, 1, 1, 11), 103)
    assert got["no-right-key"] == (None, None)
    # left schema passes through untouched
    assert out.columns == ["k", "ts", "name", "asof_ts", "asof_rid"]


def test_asof_join_single_shuffle_no_join(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # sweep, not a range join
    # one Exchange for the window key, plus at most one for the
    # right-side pre-aggregation (same key)
    assert plan.count("Exchange hashpartitioning") <= 2
