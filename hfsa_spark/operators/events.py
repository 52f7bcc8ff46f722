"""Event-sequence analytics: ordered funnels and time-series gap filling.

Beyond-reference surface: the event-stream twins of the batch operators —
the reference has no event/time-series layer at all (SURVEY.md §2.10 notes
its model is a point-in-time snapshot), but any training-data pipeline that
ingests interaction logs needs funnel conversion and regular-grid resampling.

Scale notes:
* ``funnel_stage_counts`` is window-based: ONE shuffle on the user key; the
  per-stage validity flags are chained window expressions over the same
  (partitionBy user, orderBy ts) spec, so Spark plans a single Exchange +
  Sort and evaluates the windows in sequence without re-sorting.
  Timestamp-strict semantics (stage k counts only if some stage k-1 event
  has strictly smaller ts) make the result independent of tie order —
  important for cross-engine parity AND for determinism under retries.
* ``resample_ffill`` explodes a per-key time grid (bounded by each key's
  own [min, max] span — not the global span, so a single ancient key does
  not inflate everyone's grid) and forward-fills with an IGNORE NULLS
  last-value window. Two shuffles: the per-key span aggregation and the
  fill window; both keyed on the same column so AQE can reuse exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_stage_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion counts: for each stage k, the number of
    distinct users with an ordered event chain stage_0 < stage_1 < … <
    stage_k (strict timestamp order; events at identical timestamps do
    not chain, which keeps the result independent of within-tie order).

    Returns (stage_idx, stage, n_users) — n_users is non-increasing in
    stage_idx. Plan shape: chained window minima over one (user, ts)
    sort, then a single aggregation; no self-joins, no per-stage passes
    over the raw table.
    """
    if not stages:
        raise ValueError("stages must be non-empty")

    # min ts over all rows with ts' <= ts (RANGE frame): frame-identical
    # across engines because it is keyed on the ts VALUE, not row position.
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )

    df = events
    valid_flags: list[str] = []
    prev_min: Column | None = None
    for k, stage in enumerate(stages):
        flag = f"__valid_{k}"
        if prev_min is None:
            df = df.withColumn(flag, F.col(type_col) == stage)
        else:
            df = df.withColumn(
                flag, (F.col(type_col) == stage) & (prev_min < F.col(ts_col))
            )
        prev_min = F.min(F.when(F.col(flag), F.col(ts_col))).over(w)
        valid_flags.append(flag)

    agg = df.agg(
        *[
            F.count_distinct(F.when(F.col(f), F.col(user_col))).alias(f"n_{k}")
            for k, f in enumerate(valid_flags)
        ]
    )
    # stages is small (a handful of labels): unpivot driver-side via stack.
    stack_args = ", ".join(f"{k}, '{s}', n_{k}" for k, s in enumerate(stages))
    return agg.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage_idx, stage, n_users)"
    ).select(
        F.col("stage_idx").cast("int"),
        "stage",
        F.col("n_users").cast("long"),
    )


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
) -> DataFrame:
    """Resample each key's series onto a regular ``step_seconds`` grid and
    forward-fill gaps: (key, grid_ts, value_max, filled).

    * grid spans each key's own [floor(min ts), floor(max ts)] bucket range;
    * a bucket's observed value is max(value) over its events (max: the one
      order-independent, exactly-engine-portable pick for doubles);
    * empty buckets carry the most recent earlier bucket's value
      (``filled`` = true) via last-value-ignore-nulls over the grid order.

    grid_ts is epoch seconds (bucket start). The grid explode is
    sequence()-based and bounded per key, so a sparse key costs only its
    own span; the fill window shares the key partitioning with the span
    aggregation.
    """
    step = F.lit(step_seconds)
    epoch = F.unix_timestamp(F.col(ts_col))
    bucket = (F.floor(epoch / step) * step).cast("long")

    per_bucket = (
        events.select(F.col(key_col).alias("key"), bucket.alias("grid_ts"),
                      F.col(value_col).alias("v"))
        .groupBy("key", "grid_ts")
        .agg(F.max("v").alias("value_obs"))
    )
    spans = per_bucket.groupBy("key").agg(
        F.min("grid_ts").alias("lo"), F.max("grid_ts").alias("hi")
    )
    grid = spans.select(
        "key",
        F.explode(F.sequence(F.col("lo"), F.col("hi"), step.cast("long"))).alias(
            "grid_ts"
        ),
    )

    wfill = (
        Window.partitionBy("key")
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, ["key", "grid_ts"], "left")
        .withColumn("value_max", F.last("value_obs", ignorenulls=True).over(wfill))
        .withColumn("filled", F.col("value_obs").isNull())
        .drop("value_obs")
    )


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention: users are cohorted by their first-activity period
    (floor(epoch/period)); each later active period counts toward that
    cohort's retention at offset = period − cohort_period. Output:
    (cohort_period, period_offset, n_users) — the classic
    product-analytics triangle, offset 0 row = cohort size.

    Scale: one (user, period) distinct pass (map-side combinable), one
    min-per-user aggregation, then a broadcast-friendly join keyed on the
    user — the per-user first-period table is |users| rows, far smaller
    than the event stream; the final groupBy is over |users|×|periods|
    activity rows, not raw events.
    """
    period = F.floor(F.col(ts_col).cast("long") / period_seconds).cast("long")
    activity = events.select(
        F.col(user_col).alias("__u"), period.alias("__p")
    ).distinct()
    first = activity.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (
        activity.join(first, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            (F.col("__p") - F.col("__cohort")).alias("period_offset"),
        )
        .agg(F.count_distinct(F.col("__u")).alias("n_users"))
    )


def ewma_smooth(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    horizon: int = 8,
    spike_cents: int = 20000,
    id_col: str | None = None,
) -> DataFrame:
    """Per-key EWMA smoothing + spike flags over an ordered event stream —
    the metric-smoothing / anomaly-gate primitive for telemetry and
    training-loss streams, built integer-exact so results are identical
    on any engine and any partition order.

    The EWMA is the truncated half-life form over the last ``horizon``
    rows: weight 2^(horizon-1-i) for lag i (current row heaviest), i.e.
    alpha=1/2 cut off at the horizon. Values go through floor(value·100)
    cents; ``smooth_cents = floor(Σ wᵢ·centsᵢ / Σ wᵢ)`` over the lags
    that exist (stream warm-up shrinks the window rather than padding).
    ``spike`` flags |cents − smooth_cents| > spike_cents.

    Scale: ONE shuffle on the key (all lags share a single window frame);
    the unrolled lag sum stays in whole-stage codegen — no UDF, no state
    store. The streaming twin is applyInPandasWithState with a
    horizon-deep deque per key (bounded state).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    cents = F.floor(F.col(value_col) * 100).cast("long")
    df = df.withColumn("cents", cents)
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for i in range(horizon):
        wt = 1 << (horizon - 1 - i)
        lagged = F.lag("cents", i).over(w) if i else F.col("cents")
        num = num + F.coalesce(lagged * wt, F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(wt)).otherwise(0)
    smooth = F.floor(num.cast("double") / den.cast("double")).cast("long")
    # the output id column follows order_cols (its last entry is the
    # per-key tiebreaker/event id) unless overridden — matching the
    # stateful_ewma twin's signature rather than hardcoding "event_id"
    out_id = id_col if id_col is not None else order_cols[-1]
    return df.select(
        out_id,
        key_col,
        "cents",
        smooth.alias("smooth_cents"),
        (F.abs(F.col("cents") - smooth) > spike_cents).alias("spike"),
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition statistics over per-key event
    streams — the behavioral-model fit step (and the generator of
    synthetic-session simulators): for each (from_type, to_type) of
    CONSECUTIVE events within a key, the count and the row-conditional
    probability floor-micro integer
    ``p_micro = floor(1e6 · n / n_from)``.

    Scale: one shuffle for the per-key lag window, then a map-combinable
    groupBy on the (from, to) pair — the matrix is |types|², tiny; the
    conditional denominator folds from the pair counts themselves (one
    more groupBy on the matrix, not the events).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(key_col),
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    denom = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(denom, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            "n_from",
            F.floor(
                F.col("n").cast("double") * 1000000.0 / F.col("n_from").cast("double")
            ).cast("long").alias("p_micro"),
        )
        .orderBy("from_type", "to_type")
    )
