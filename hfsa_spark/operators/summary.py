"""Summary report (the flagship; SURVEY.md §2.6 A1/A2, §2.7 K1, §2.4 F1).

Reference: /root/reference tool/.../SummaryReportCommand.java:295-384 — one
parallel traversal accumulating per-group, per-user and overall stats
(ConcurrentHashMap + LongAdder) with an exponential file-size histogram.

Spark-first: ONE scan with ``GROUPING SETS ((user), (group), ())`` — the
Expand operator feeds all three groupings from a single pass, with map-side
partial aggregation, exactly replacing the reference's
"one traversal feeds three accumulators" without custom code. The
46-bucket histogram is 46 conditional sums (codegen'd, no UDF); unused high
buckets are trimmed at display time (dynamic bucket count,
SizeBucket.java:124-141).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hfsa_spark.functions.buckets import size_bucket, MAX_BUCKETS
from hfsa_spark.functions.paths import subtree_predicate


class SummarySort(Enum):
    """Summary sort keys (SummaryReportCommand.java:101-133): ascending."""

    FILE_SIZE = "fs"
    FILE_COUNT = "fc"
    DIR_COUNT = "dc"
    BLOCK_COUNT = "bc"

    @property
    def column(self) -> str:
        return {
            "fs": "sum_file_size",
            "fc": "sum_files",
            "dc": "sum_directories",
            "bc": "sum_blocks",
        }[self.value]


@dataclass
class SummaryReport:
    dir: str
    overall: DataFrame  # 1 row incl. distinct user/group counts
    by_group: DataFrame
    by_user: DataFrame


def _stat_aggs(num_buckets: int) -> list:
    """Aggregate columns built as SQL strings (a handful of F.expr calls,
    not hundreds of Column-algebra py4j round-trips): with 46 histogram
    buckets the Column-at-a-time form cost ~0.4 s of DRIVER time per
    report build — measured, same lesson as __spark_entry__._namespace."""
    buckets = ", ".join(
        f"sum(case when type = 'FILE' and __bucket = {i} then 1 else 0 end)"
        for i in range(num_buckets)
    )
    exprs = [
        "sum(case when type = 'DIRECTORY' then 1 else 0 end) as sum_directories",
        "sum(case when type = 'SYMLINK' then 1 else 0 end) as sum_symlinks",
        "sum(case when type = 'FILE' then 1 else 0 end) as sum_files",
        "sum(case when type = 'FILE' then file_size else 0 end) as sum_file_size",
        "sum(case when type = 'FILE' then consumed_size else 0 end) as sum_consumed_size",
        "sum(case when type = 'FILE' then num_blocks else 0 end) as sum_blocks",
        f"array({buckets}) as size_buckets",
    ]
    return [F.expr(e) for e in exprs]


def summary_report(
    inodes: DataFrame,
    dir: str = "/",
    user_filter: str | None = None,
    sort: SummarySort = SummarySort.FILE_SIZE,
    num_buckets: int = MAX_BUCKETS,
) -> SummaryReport:
    """Build the summary report for one start directory.

    ``user_filter`` is a *substring* regex applied AFTER aggregation to the
    user rows only — overall and group stats are unaffected
    (filterByUserName, SummaryReportCommand.java:285-293, F1 semantics).
    """
    scoped = inodes.filter(subtree_predicate("full_path", dir)).withColumn(
        "__bucket", size_bucket("file_size")
    )

    grouped = (
        scoped.groupingSets([["user"], ["group"], []], "user", "group")
        .agg(
            *_stat_aggs(num_buckets),
            F.grouping_id("user", "group").alias("__gid"),
        )
    )

    stat_cols = [
        "sum_directories",
        "sum_symlinks",
        "sum_files",
        "sum_file_size",
        "sum_consumed_size",
        "sum_blocks",
        "size_buckets",
    ]
    # distinct user/group counts only exist on the overall row — keeping
    # countDistinct OUT of the shared agg spares by_user/by_group the
    # distinct-rewrite Expand (an extra pass over every grouping set)
    distinct_counts = scoped.agg(
        F.expr("count(distinct user) as num_users"),
        F.expr("count(distinct `group`) as num_groups"),
    )
    overall = (
        grouped.filter(F.col("__gid") == 3)
        .crossJoin(F.broadcast(distinct_counts))
        .select("num_groups", "num_users", *stat_cols)
    )
    by_group = (
        grouped.filter(F.col("__gid") == 2)
        .select(F.col("group"), *stat_cols)
        .orderBy(F.col(sort.column).asc(), F.col("group").asc())
    )
    by_user = grouped.filter(F.col("__gid") == 1).select(F.col("user"), *stat_cols)
    if user_filter:
        # substring match (java Matcher.find) == unanchored rlike
        by_user = by_user.filter(F.col("user").rlike(user_filter))
    by_user = by_user.orderBy(F.col(sort.column).asc(), F.col("user").asc())

    return SummaryReport(dir=dir, overall=overall, by_group=by_group, by_user=by_user)
