"""Per-user size-by-location report (SURVEY.md §2.6 A5, §2.7 K4, §2.4 F5/F6).

Reference: /root/reference tool/.../UserUsageReportCommand.java:179-233.

Semantics: files owned by ``user`` (case-insensitive equality, :190) older
than ``age_ms`` (``mtime < now - age_ms``, :186-188; age 0 ⇒ everything),
summed per PARENT directory, rolled up to all ancestors (A4), sorted size
desc / path asc, limited to N (default 20, :43-46,164-177).

``now_ms`` is injected — never wall-clock — so results are reproducible
(golden tests and the duckdb oracle depend on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hfsa_spark.functions.paths import subtree_predicate
from hfsa_spark.operators.rollup import ancestor_rollup


def user_usage_report(
    inodes: DataFrame,
    user: str,
    now_ms: int,
    age_ms: int = 0,
    dir: str = "/",
    limit: int | None = 20,
) -> DataFrame:
    """Returns (path, sum_size) — ancestor-rolled-up bytes for one user.

    ``limit=None`` skips the top-N cut (the txt sink needs the full rollup
    to size its path column the way the reference does, :156-160)."""
    files = inodes.filter(
        subtree_predicate("full_path", dir)
        & (F.col("type") == "FILE")
        & (F.lower(F.col("user")) == user.lower())
        & (F.col("mtime") < F.lit(now_ms - age_ms))
    ).select("path", "file_size")

    rolled = ancestor_rollup(files, "path", {"sum_size": F.sum("file_size")})
    if limit is None:
        return rolled
    return rolled.orderBy(F.col("sum_size").desc(), F.col("path").asc()).limit(limit)
