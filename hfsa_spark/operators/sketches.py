"""Approximate (sketch-based) aggregations: the 100 TB path for distinct
counts and quantiles, where exact answers need a full shuffle of every
distinct value but a sketch is a few KB per group, merged map-side.

Beyond-reference surface: the reference computes only exact counts
(single-node, it can afford to); at cluster scale approximate-first is
the default and exact is the audit path. Each helper returns BOTH the
sketch estimate and (optionally) the exact value so callers — and the
correctness gate — can bound the error instead of trusting it.

Scale notes:
* ``approx_count_distinct`` is HyperLogLog++: fixed-size registers,
  map-side partial merge — the shuffle carries one sketch per
  (partition, group) instead of one row per distinct value. rsd=0.05
  → ~1.5 KB per sketch; rsd=0.01 → ~24 KB.
* ``approx_percentile`` (Greenwald-Khanna variant) is likewise
  mergeable; accuracy parameter trades memory for rank error.
* Exact companions are plain countDistinct/percentile — use them at
  audit time or on pre-aggregated slices, not per-query at full scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.05,
    bound: float = 0.15,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group distinct-count estimate (HLL++, relative std dev ``rsd``)
    next to the exact count and a ``within_bound`` check
    (|approx − exact| ≤ bound·exact). At audit scale keep
    ``with_exact=True``; at 100 TB run with ``with_exact=False`` and the
    shuffle shrinks from one row per distinct value to one sketch per
    group per partition.
    """
    aggs = [
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_nd"),
    ]
    if with_exact:
        aggs.append(F.count_distinct(F.col(value_col)).alias("exact_nd"))
    out = df.groupBy(group_col).agg(*aggs)
    if with_exact:
        err = F.abs(F.col("approx_nd") - F.col("exact_nd"))
        out = out.withColumn(
            "within_bound", err <= F.lit(bound) * F.col("exact_nd")
        )
    return out


def approx_quantile_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (mergeable GK sketch) next to the
    exact continuous percentiles; rank error ≤ 1/accuracy. Returns one
    row per group with arrays ``approx_q`` / ``exact_q`` (same order as
    ``probabilities``).
    """
    probs = F.array(*[F.lit(p) for p in probabilities])
    return df.groupBy(group_col).agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("approx_q"),
        F.percentile(F.col(value_col), probs).alias("exact_q"),
    )
