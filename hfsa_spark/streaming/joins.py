"""Stream-stream joins with event-time bounds (Structured Streaming).

The batch engine's interval join is operators/rangejoin.py (chunk-bucketed
equi join). This module is the *streaming* form: two unbounded inputs,
watermarks bounding how much past each side must buffer, and a time-range
join condition so the state store can evict rows once they can no longer
match — the three ingredients Structured Streaming requires before it
will run a stream-stream join at all.

Scale notes:
* state per side is bounded by (watermark window × input rate), not stream
  length — eviction is driven by the watermark, so the lag tolerance is
  the state-size knob;
* the join itself shuffles both sides on the equi keys (same partitioning
  story as the batch join); the time-range predicate prunes within each
  key group;
* late rows beyond the watermark are dropped by definition — the batch
  twin over the same closed input is the exactness oracle
  (tests/test_streaming_joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by_cols: list[str] | None = None,
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join each left row with right rows of the same keys whose timestamp
    falls in ``[left.ts + lower_seconds, left.ts + upper_seconds]``.

    Works identically on batch DataFrames (no watermark applied) and
    streaming DataFrames (watermark + range condition make the state
    bounded). Output carries all left columns plus the right side's
    non-key columns suffixed ``_r`` (its timestamp as ``{ts_col}_r``).
    """
    by_cols = by_cols or []

    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
    if right.isStreaming:
        right = right.withWatermark(ts_col, watermark)

    l = left.alias("l")
    r = right.alias("r")
    renames = [
        F.col(f"r.{c}").alias(f"{c}_r")
        for c in right.columns
        if c not in by_cols
    ]
    cond = (
        (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    for c in by_cols:
        cond = (F.col(f"l.{c}") == F.col(f"r.{c}")) & cond
    out = l.join(r, cond, how)
    return out.select([F.col(f"l.{c}") for c in left.columns] + renames)
