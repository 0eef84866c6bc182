"""Point-in-interval join via bucket decomposition — the range-join
primitive (IP→geo lookup, event→session attribution, time-window
containment). Spark's equi-join machinery can't use an inequality
predicate as a join key, so the naive formulation is a broadcast
nested loop (or worse, a cartesian product) over every (point,
interval) pair sharing the key.

Scale shape: intervals are exploded to the fixed-width buckets they
cover, points map to exactly ONE bucket, and the join is a plain hash
equi-join on (keys..., bucket) followed by the exact containment
filter. Cost: |intervals| x avg-span/width extra rows on the interval
side (choose ``bucket_width`` ~ the median interval length), one
shuffle, no nested loop. Each (point, interval) pair meets in exactly
one bucket — the point's — so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_width: int = 3600,
    inclusive_end: bool = True,
) -> DataFrame:
    """Inner-join every ``points`` row to the ``intervals`` rows whose
    [start, end] (or [start, end) with ``inclusive_end=False``) contains
    its ``point_col``, matching on ``keys`` first. Numeric (epoch-like)
    columns. Output: all point columns + all interval columns except
    the keys.
    """
    keys = keys or []
    b = lambda c: F.floor(F.col(c) / bucket_width)  # noqa: E731
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(b(start_col), b(end_col))),
    )
    pt = points.withColumn("_bucket", b(point_col))
    contained = F.col(start_col) <= F.col(point_col)
    contained &= (
        F.col(point_col) <= F.col(end_col)
        if inclusive_end
        else F.col(point_col) < F.col(end_col)
    )
    out_cols = [F.col(c) for c in points.columns] + [
        F.col(c) for c in intervals.columns if c not in keys
    ]
    return (
        pt.join(iv, [*keys, "_bucket"])
        .filter(contained)
        .select(*out_cols)
    )
