"""Hierarchical ancestor rollup (SURVEY.md §2.6 A4) — the one aggregation
pattern Catalyst lacks built-in.

Reference semantics (``aggregatePaths``, /root/reference
tool/.../SmallFilesReportCommand.java:317-334 and its duplicate
tool/.../UserUsageReportCommand.java:216-233): every path's stats are added
to ALL of its ancestors including root; each key also keeps its own total.

Spark-first rewrite: explode the ancestor-prefix array (a higher-order
``transform``/``sequence`` expression — JVM-side, codegen'd) and
re-aggregate. One shuffle keyed on the ancestor path.

Scale: the explode multiplies rows by average depth (~10-20×), but rows are
(path, few longs) — map-side partial aggregation collapses them before the
shuffle, so network volume is bounded by the number of *distinct directory
paths*, not files. For skewed roots ('/' receives every row) the partial
aggregation also does the heavy lifting: each task emits one '/' row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfsa_spark.functions.paths import ancestors


def ancestor_rollup(
    df: DataFrame,
    path_col: str,
    aggs: dict[str, Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Roll ``aggs`` up the directory hierarchy of ``path_col``.

    Returns one row per (ancestor path [, extra_keys]) with each aggregate
    summed over all rows at-or-below that path. Output path column keeps the
    name ``path_col``.

    Two-level plan: aggregate per exact (path [, keys]) FIRST, then explode
    each path's ancestor prefixes and SUM the partials. Explode volume is
    #distinct-dirs × depth instead of #rows × depth — at 10^9 files over
    10^7 directories that's a 100× smaller Generate + shuffle. Contract:
    ``aggs`` must be sum-decomposable (sum/count — all the reference's
    rollups are; aggregatePaths only ever adds counters/sizes).
    """
    keys = list(extra_keys or [])
    named = [expr.alias(name) for name, expr in aggs.items()]
    per_path = df.groupBy(path_col, *[F.col(k) for k in keys]).agg(*named)
    exploded = per_path.withColumn("__anc", F.explode(ancestors(path_col)))
    out = exploded.groupBy(F.col("__anc").alias(path_col), *[F.col(k) for k in keys]).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )
    return out
