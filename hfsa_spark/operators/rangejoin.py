"""Range (interval-containment) join — point-in-interval matching without a
cross product.

Spark has no native range-join strategy: an `ON key AND point BETWEEN start
AND end` join plans as an equi join on key with the inequality as a
post-join filter — fine when keys are selective, quadratic inside a hot key
(and a BroadcastNestedLoopJoin disaster with no key at all). The standard
scale technique is **chunk bucketing**: quantize the range dimension into
fixed-width buckets, explode each interval to every bucket it covers, tag
each point with its single bucket, and equi-join on (key, bucket) before
the exact containment filter. The inequality join becomes a hash join whose
shuffle is keyed on (key, bucket):

* each (interval, point) pair meets in exactly ONE bucket (the point's), so
  no post-join dedup is needed;
* shuffle volume = |points| + Σ(interval_span / bucket_width) rows — pick
  ``bucket_width`` near the median interval length so intervals explode to
  ~1-2 buckets;
* time-ordered data gives bucket locality; a hot (key, bucket) is split by
  AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by_cols: list[str] | None = None,
    bucket_width: int = 3600,
) -> DataFrame:
    """Inner join of each point row to every interval row containing it
    (``start <= point <= end``, closed on both ends), optionally also
    matching on ``by_cols``. Range columns must be numeric (cast timestamps
    to epoch seconds first). Returns all columns from both sides.
    """
    by_cols = by_cols or []
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / bucket_width))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    return (
        i.join(p, by_cols + ["__bucket"])
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
        .drop("__bucket")
    )
