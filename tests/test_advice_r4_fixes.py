"""Regression tests for the round-4 ADVICE.md findings.

1. retrieval_eval: the -1 self-exclusion applies ONLY to queries whose
   id exists in the corpus; an external query keeps n_relevant = label_n.
2. daily_distinct_rollup: the sketch-union window frame is CALENDAR days
   (rangeBetween on epoch days), not the last N present rows, so it stays
   commensurable with the exact date_sub audit path when days are missing.
3. ewma_smooth: the output id column follows order_cols / id_col instead
   of a hardcoded "event_id".
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_retrieval_eval_external_query_keeps_full_label_n(spark):
    from hfsa_spark.operators.similarity import retrieval_eval

    def vec(a: float, b: float = 0.0, h: float = 0.0):
        return [float(a), float(b), 0.0, 0.0, 0.0, 0.0, 0.0, float(h)]

    # corpus: 4 rows of label "a" clustered near e1, 2 rows of label "b"
    corpus = spark.createDataFrame(
        [
            (1, vec(1.0), "a"),
            (2, vec(0.9, 0.1), "a"),
            (3, vec(0.8, 0.2), "a"),
            (4, vec(0.7, 0.3), "a"),
            (5, vec(0.0, 0.0, 1.0), "b"),
            (6, vec(0.0, 0.1, 1.0), "b"),
        ],
        "vec_id long, embedding array<float>, label string",
    )
    # query 1 is IN the corpus (self-excluded → n_relevant = 4-1 = 3);
    # query 99 is EXTERNAL (nothing excluded → n_relevant = 4)
    queries = spark.createDataFrame(
        [(1, vec(1.0), "a"), (99, vec(0.95, 0.05), "a")],
        "vec_id long, embedding array<float>, label string",
    )
    rows = {r["query_id"]: r for r in
            retrieval_eval(corpus, queries, k=3).collect()}
    assert rows[1]["n_relevant"] == 3
    assert rows[99]["n_relevant"] == 4
    # the external query's top-3 are all label-a rows → full recall
    assert rows[99]["hits_at_k"] == 3


def test_daily_distinct_rollup_calendar_days_with_gap(spark):
    from hfsa_spark.operators.sketches import daily_distinct_rollup

    # days 1..3 present, days 4..9 MISSING, day 10 present.
    # With a 7-day window, day 10's window covers days 4..10 → only
    # day 10's users (a row-frame over present days would wrongly pull
    # in days 1..3). Disjoint user sets per day make the counts sharp.
    rows = []
    for day, users in [(1, [1, 2]), (2, [3, 4]), (3, [5, 6]), (10, [7, 8, 9])]:
        for u in users:
            rows.append((datetime.datetime(2024, 1, day, 12, 0), u))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = {r["day"].day: r for r in
           daily_distinct_rollup(ev, window_days=7, lg_k=12).collect()}
    assert out[3]["w_exact"] == 6          # days 1-3 all inside the window
    assert out[10]["w_exact"] == 3         # calendar window excludes days 1-3
    # the sketch path must agree with the exact path on these tiny sets
    assert out[10]["w_est"] == 3
    assert out[3]["w_est"] == 6
    assert all(r["within_bound"] for r in out.values())


def test_ewma_smooth_custom_order_cols_id(spark):
    from hfsa_spark.operators.events import ewma_smooth

    df = spark.createDataFrame(
        [(1, "u1", 10, 1.0), (2, "u1", 20, 2.0), (3, "u2", 5, 3.0)],
        "my_id long, user_id string, ts long, value double",
    )
    out = ewma_smooth(df, order_cols=("ts", "my_id"))
    assert "my_id" in out.columns and "event_id" not in out.columns
    got = {r["my_id"]: r["smooth_cents"] for r in out.collect()}
    assert got[1] == 100                    # warm-up: just the first value
    assert got[2] == (2 * 200 + 1 * 100) // 3
    assert got[3] == 300

    # explicit id_col override wins over order_cols
    out2 = ewma_smooth(df, order_cols=("ts",), id_col="my_id")
    assert "my_id" in out2.columns
