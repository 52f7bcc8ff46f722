"""Small-files hotspot report (SURVEY.md §2.6 A3/A4, §2.7 K2/K3/K6,
§2.4 F2/F4).

Reference: /root/reference tool/.../SmallFilesReportCommand.java:278-334.

Exact semantics encoded here (and pinned by tests):
* small file ⇔ ``file_size < limit`` — STRICTLY less, despite the
  reference's ``--help`` claiming "less equals" (:101-105 vs :288). Default
  limit 2 MiB.
* the user-name filter is a FULL-match regex applied during aggregation to
  the per-user stats only; overall counts stay unfiltered
  (createUserNameFilter :336-344, use :290-293 — F2, contrast with
  summary's post-agg substring filter F1).
* per-path counts key on the file's PARENT directory (the visitor's
  ``path`` argument), then roll up to all ancestors (A4).
* global hotspots: count desc, limit N (default 10) (:189-194).
* per-user hotspots: count desc / path asc within user, limit N; users
  ranked by total small files desc; only the top 10 users get detail —
  hardcoded, independent of N (:235-265).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hfsa_spark.functions.paths import subtree_predicate
from hfsa_spark.operators.rollup import ancestor_rollup

DEFAULT_LIMIT_BYTES = 2 * 1024 * 1024
TOP_USERS_WITH_DETAIL = 10  # hardcoded in the reference (:235-247)


@dataclass
class SmallFilesReport:
    dir: str
    limit_bytes: int
    overall: DataFrame  # 1 row: total small files (unfiltered by user regex)
    path_hotspots: DataFrame  # rolled-up (path, count), top-N
    user_summary: DataFrame  # (user, count, pct_of_total) desc
    user_hotspots: DataFrame  # (user, path, count) — top-N per top-10 user
    raw_user_path_counts: DataFrame  # (user, path, count) pre-rollup (csv sink)
    _persisted: DataFrame | None = None

    def unpersist(self) -> None:
        if self._persisted is not None:
            self._persisted.unpersist()


def small_files_report(
    inodes: DataFrame,
    dir: str = "/",
    limit_bytes: int = DEFAULT_LIMIT_BYTES,
    user_filter: str | None = None,
    hotspot_limit: int = 10,
    user_hotspot_limit: int = 10,
    persist: bool = False,
) -> SmallFilesReport:
    """``persist=True`` caches the filtered (user, path) projection —
    the report fans out into four result DataFrames, and a consumer that
    collects all of them (the txt/csv sinks, the CLI) would otherwise
    re-scan the source once per branch. The projection is two thin string
    columns, so the cached footprint is tiny relative to the source;
    call ``report.unpersist()`` when done."""
    small = inodes.filter(
        subtree_predicate("full_path", dir)
        & (F.col("type") == "FILE")
        & (F.col("file_size") < limit_bytes)
    ).select("user", "path")
    if persist:
        small = small.persist()

    # overall count — never user-filtered (:290-293)
    overall = small.agg(F.count(F.lit(1)).alias("small_files_total"))

    # global per-dir counts rolled up to ancestors, top-N by count desc
    path_counts = ancestor_rollup(small, "path", {"count": F.count(F.lit(1))})
    path_hotspots = path_counts.orderBy(F.col("count").desc(), F.col("path").asc()).limit(
        hotspot_limit
    )

    # per-user branch: FULL-match regex during aggregation (F2)
    user_small = small
    if user_filter:
        user_small = user_small.filter(F.col("user").rlike(f"^(?:{user_filter})$"))

    user_totals = user_small.groupBy("user").agg(F.count(F.lit(1)).alias("count"))
    user_summary = (
        user_totals.crossJoin(F.broadcast(overall))
        .withColumn(
            "pct_of_total",
            F.col("count").cast("double") / F.col("small_files_total").cast("double") * 100.0,
        )
        .select("user", "count", "pct_of_total")
        .orderBy(F.col("count").desc(), F.col("user").asc())
    )

    top_users = user_totals.orderBy(F.col("count").desc(), F.col("user").asc()).limit(
        TOP_USERS_WITH_DETAIL
    )
    per_user_counts = ancestor_rollup(
        user_small, "path", {"count": F.count(F.lit(1))}, extra_keys=["user"]
    )
    w = Window.partitionBy("user").orderBy(F.col("count").desc(), F.col("path").asc())
    user_hotspots = (
        per_user_counts.join(F.broadcast(top_users.select("user")), "user", "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= user_hotspot_limit)
        .drop("__rn")
        .orderBy(F.col("user").asc(), F.col("count").desc(), F.col("path").asc())
    )

    return SmallFilesReport(
        dir=dir,
        limit_bytes=limit_bytes,
        overall=overall,
        path_hotspots=path_hotspots,
        user_summary=user_summary,
        user_hotspots=user_hotspots,
        raw_user_path_counts=user_small.groupBy("user", "path").agg(
            F.count(F.lit(1)).alias("count")
        ),
        _persisted=small if persist else None,
    )
