"""Tests for event-sequence operators: ordered funnel + gap-fill resample."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from hfsa_spark.operators.events import funnel_stage_counts, resample_ffill

_T0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, _T0 + timedelta(seconds=s), t, v) for (u, s, t, v) in rows],
        "user_id long, ts timestamp, event_type string, value double",
    )


def _counts(df):
    return {r["stage"]: r["n_users"] for r in df.collect()}


def test_funnel_requires_order(spark):
    # user 1: full ordered chain; user 2: purchase BEFORE click (breaks);
    # user 3: view only.
    rows = [
        (1, 0, "view", 0.0), (1, 10, "click", 0.0), (1, 20, "purchase", 0.0),
        (2, 0, "view", 0.0), (2, 5, "purchase", 0.0), (2, 10, "click", 0.0),
        (3, 0, "view", 0.0),
    ]
    got = _counts(funnel_stage_counts(_ev(spark, rows), ["view", "click", "purchase"]))
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_equal_ts_does_not_chain(spark):
    # strict order: click at the SAME second as view does not count.
    rows = [(1, 0, "view", 0.0), (1, 0, "click", 0.0), (1, 5, "click", 0.0)]
    got = _counts(funnel_stage_counts(_ev(spark, rows), ["view", "click"]))
    assert got == {"view": 1, "click": 1}
    rows2 = [(1, 0, "view", 0.0), (1, 0, "click", 0.0)]
    got2 = _counts(funnel_stage_counts(_ev(spark, rows2), ["view", "click"]))
    assert got2 == {"view": 1, "click": 0}


def test_funnel_monotone_and_empty_stages_error(spark):
    rows = [(u, s, t, 0.0) for u in range(5) for (s, t) in
            [(0, "view"), (1, "click")]] + [(0, 2, "purchase", 0.0)]
    out = funnel_stage_counts(_ev(spark, rows), ["view", "click", "purchase"])
    ns = [r["n_users"] for r in out.orderBy("stage_idx").collect()]
    assert ns == sorted(ns, reverse=True) == [5, 5, 1]
    with pytest.raises(ValueError):
        funnel_stage_counts(_ev(spark, rows), [])


def test_resample_ffill_fills_gaps_per_key(spark):
    # key 1: observations in minute-buckets 0 and 3 (step=60s) → 1,2 filled.
    # key 2: single bucket → no fill rows.
    rows = [
        (1, 0, "view", 10.0), (1, 30, "view", 12.0),  # bucket 0 → max 12
        (1, 3 * 60, "view", 5.0),
        (2, 7 * 60, "view", 1.0),
    ]
    out = resample_ffill(_ev(spark, rows), step_seconds=60).orderBy("key", "grid_ts")
    got = [(r["key"], r["grid_ts"], r["value_max"], r["filled"]) for r in out.collect()]
    base = _T0.timestamp()
    assert got == [
        (1, int(base) + 0, 12.0, False),
        (1, int(base) + 60, 12.0, True),
        (1, int(base) + 120, 12.0, True),
        (1, int(base) + 180, 5.0, False),
        (2, int(base) + 420, 1.0, False),
    ]


def test_resample_grid_is_per_key_not_global(spark):
    rows = [(1, 0, "view", 1.0), (2, 600, "view", 2.0), (2, 660, "view", 3.0)]
    out = resample_ffill(_ev(spark, rows), step_seconds=60)
    per_key = {r["key"]: r["n"] for r in
               out.groupBy("key").agg(F.count("*").alias("n")).collect()}
    # key 1 spans one bucket, key 2 two buckets — no global-span inflation
    assert per_key == {1: 1, 2: 2}


def test_cohort_retention(spark):
    import datetime as dt

    from hfsa_spark.operators.events import cohort_retention

    base = dt.datetime(2024, 1, 1)  # epoch 1704067200, divisible by 86400

    def t(days):
        return base + dt.timedelta(days=days)

    rows = [
        # user 1: first day 0, returns day 1 and day 2
        (1, t(0)), (1, t(1)), (1, t(2)), (1, t(1)),
        # user 2: first day 0, returns day 2
        (2, t(0)), (2, t(2)),
        # user 3: first day 1 (different cohort), returns day 2
        (3, t(1)), (3, t(2)),
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {
        (r["cohort_period"] - 19723, r["period_offset"]): r["n_users"]
        for r in cohort_retention(ev, period_seconds=86400).collect()
    }
    assert out == {
        (0, 0): 2, (0, 1): 1, (0, 2): 2,
        (1, 0): 1, (1, 1): 1,
    }


def test_ewma_smooth_warmup_and_spike(spark):
    from hfsa_spark.operators.events import ewma_smooth

    rows = [
        # user 1: constant 1.00 then a 500.00 spike
        (1, 1, "2024-01-01 00:00:00", 1.0),
        (2, 1, "2024-01-01 00:01:00", 1.0),
        (3, 1, "2024-01-01 00:02:00", 500.0),
        # user 2: single event — EWMA is the value itself
        (4, 2, "2024-01-01 00:00:00", 7.25),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_id"]: r for r in ewma_smooth(df).collect()}
    # warm-up: first row's window is itself
    assert got[1]["smooth_cents"] == 100
    assert got[2]["smooth_cents"] == 100
    # spike row: (50000*128 + 100*64 + 100*32) / (128+64+32) = 28614.28..
    assert got[3]["smooth_cents"] == (50000 * 128 + 100 * 64 + 100 * 32) // 224
    assert got[3]["spike"] is True
    assert got[1]["spike"] is False
    assert got[4]["smooth_cents"] == 725


def test_event_transitions(spark):
    from hfsa_spark.operators.events import event_transitions

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:01:00", "click"),
        (3, 1, "2024-01-01 00:02:00", "view"),
        (4, 2, "2024-01-01 00:00:00", "view"),   # first event: no pair
        (5, 2, "2024-01-01 00:01:00", "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, value string"
    ).select("event_id", "user_id", F.to_timestamp("ts").alias("ts"),
             F.col("value").alias("event_type"))
    got = {(r["from_type"], r["to_type"]): r for r in event_transitions(df).collect()}
    # view → {click, buy}: n_from = 2, each 500000 micro
    assert got[("view", "click")]["n"] == 1
    assert got[("view", "click")]["p_micro"] == 500000
    assert got[("view", "buy")]["p_micro"] == 500000
    assert got[("click", "view")]["p_micro"] == 1000000
    assert ("buy", "view") not in got  # cross-user boundary never pairs
