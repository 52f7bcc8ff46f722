"""Point inode lookup (SURVEY.md §2.3 L1/L2/L7).

Reference: /root/reference tool/.../InodeInfoCommand.java:61-93 — each
argument is an inode id (digits) or an absolute path; successes yield the
full record, failures an error row.

Spark-first: a single scan with ``id IN (...) OR full_path IN (...)`` —
parquet min/max row-group pruning makes the id lookup near-O(1) when the
extract is sorted by id; the path lookup prunes on the partition column
when partitioned by top dir. No tree walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hfsa_spark.functions.paths import normalize_path


def inode_info(inodes: DataFrame, refs: list[str | int]) -> DataFrame:
    """Look up inodes by id or absolute path. Returns all columns plus the
    matched ``ref``; callers detect failures by refs absent from the result."""
    ids = [int(r) for r in refs if str(r).isdigit()]
    paths = [normalize_path(str(r)) for r in refs if not str(r).isdigit()]

    cond = F.lit(False)
    if ids:
        cond = cond | F.col("id").isin(ids)
    if paths:
        cond = cond | F.col("full_path").isin(paths)

    matched = inodes.filter(cond)
    ref_expr = (
        F.when(F.col("id").isin(ids) if ids else F.lit(False), F.col("id").cast("string"))
        .otherwise(F.col("full_path"))
        .alias("ref")
    )
    return matched.select(ref_expr, "*")
