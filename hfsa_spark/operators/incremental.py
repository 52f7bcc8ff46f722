"""Incremental aggregate-state maintenance (algebraic partials).

The 100 TB pattern for standing rollups: never re-scan history. Keep a
per-key STATE table of algebraic partials (count, sum, min, max — each
mergeable), fold every new batch's partials into it, and finalize
(mean = sum/count, etc.) only at read time. A day's maintenance cost is
then O(batch) + O(distinct keys), independent of corpus age — the same
reason combiners exist inside a single Spark aggregate, applied ACROSS
jobs. (The distinct-count twin, which needs a sketch rather than a
scalar, lives in operators/sketches.py::daily_distinct_rollup.)

Values are held as integer cents (``floor(value·100)``) so that state
merged in any order or grouping is bit-identical to a one-shot
recompute — the repo's standing integer-exactness convention, and what
makes the q207 gate a VALUE oracle rather than a tolerance check.

All three steps are single hash aggregates (map-side combine applies);
merge shuffles only state rows, never raw data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_rows", "sum_cents", "min_cents", "max_cents")


def build_agg_state(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str = "value",
) -> DataFrame:
    """One batch → per-key algebraic partials."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
    )


def merge_agg_states(
    *states: DataFrame, key_cols: Sequence[str] | None = None
) -> DataFrame:
    """Fold any number of state tables into one (merge is the same
    algebra as build: sum the counts/sums, min the mins, max the maxes).
    Associative and commutative, so daily states can be merged in any
    tree shape — shuffle cost is O(state rows).

    ``key_cols`` defaults to every column not named like a state column;
    pass it explicitly if a grouping column shares a STATE_COLS name
    (the inference would silently drop it from the groupBy otherwise).
    """
    if not states:
        raise ValueError("merge_agg_states needs at least one state")
    if key_cols is None:
        key_cols = [c for c in states[0].columns if c not in STATE_COLS]
    else:
        key_cols = list(key_cols)
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("min_cents").alias("min_cents"),
        F.max("max_cents").alias("max_cents"),
    )


def finalize_agg_state(state: DataFrame) -> DataFrame:
    """Read-time finalize: derived stats that are NOT mergeable and so
    never live in the state — integer-exact mean (floor division)."""
    return state.withColumn(
        "mean_cents",
        F.floor(F.col("sum_cents") / F.col("n_rows")).cast("long"),
    )
