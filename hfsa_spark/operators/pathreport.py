"""Recursive path listing with predicates (SURVEY.md §2.6 A6, §2.7 K5,
§2.4 F3).

Reference: /root/reference tool/.../PathReportCommand.java:81-154.

Semantics: visit one or more start dirs (UNION ALL, T4); optional FULL-match
user regex applied per-inode to all three types (F3); results dedup'd by
path only (the reference's ConcurrentSkipListSet compares paths, :89) and
ordered by path (K5); global type counters (A6). The start dir itself is
listed (T3).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hfsa_spark.functions.paths import subtree_predicate
from hfsa_spark.functions.perms import permission_triple


@dataclass
class PathReport:
    listing: DataFrame  # ordered by full_path, dedup'd on full_path
    counts: DataFrame  # 1 row: file/dir/symlink counts


def path_report(
    inodes: DataFrame,
    dirs: list[str] | None = None,
    user_filter: str | None = None,
) -> PathReport:
    dirs = dirs or ["/"]
    scoped = reduce(
        DataFrame.unionAll,
        [inodes.filter(subtree_predicate("full_path", d)) for d in dirs],
    )
    if user_filter:
        scoped = scoped.filter(F.col("user").rlike(f"^(?:{user_filter})$"))

    # dedup by path ONLY — overlapping start dirs list each path once (:89)
    deduped = scoped.dropDuplicates(["full_path"])

    listing = deduped.select(
        "type",
        permission_triple("user", "group", "mode").alias("permission"),
        "user",
        "group",
        "mode",
        "file_size",
        "mtime",
        "full_path",
    ).orderBy(F.col("full_path").asc())

    counts = deduped.agg(
        F.sum(F.when(F.col("type") == "FILE", 1).otherwise(0)).alias("file_count"),
        F.sum(F.when(F.col("type") == "DIRECTORY", 1).otherwise(0)).alias("dir_count"),
        F.sum(F.when(F.col("type") == "SYMLINK", 1).otherwise(0)).alias("symlink_count"),
    )
    return PathReport(listing=listing, counts=counts)
