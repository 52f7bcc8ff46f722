"""applyInPandasWithState sessionization: state survives micro-batch
boundaries and closed sessions match the batch windowed form exactly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _write_ordered_files(spark, base):
    """Events for 3 users over 3 time-ordered files (⇒ 3 micro-batches with
    maxFilesPerTrigger=1): sessions deliberately span file boundaries."""
    rows = [
        # file 0: t in [0, 100]
        [(1, 0, 1.0), (1, 50, 2.0), (2, 10, 5.0)],
        # file 1: t in [1000, 2000] — closes u1's and u2's first sessions
        # (gap 600); u1's new session spans into file 2
        [(1, 1000, 3.0), (2, 1100, 7.0), (3, 1200, 9.0)],
        # file 2: t in [1500, 5000]
        [(1, 1500, 4.0), (1, 5000, 8.0), (2, 1300, 11.0)],
    ]
    for i, batch in enumerate(rows):
        spark.createDataFrame(
            batch, "user_id bigint, ts_s bigint, value double"
        ).coalesce(1).write.parquet(os.path.join(base, f"f{i}"))
    return [os.path.join(base, f"f{i}") for i in range(3)]


def test_stateful_sessions_match_batch(spark, tmp_path):
    from hfsa_spark.streaming.stateful import stateful_sessionize

    base = str(tmp_path / "stream_src")
    os.makedirs(base)
    dirs = _write_ordered_files(spark, base)
    # file source lists in path order; fN names sort in time order
    for i, d in enumerate(dirs):
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.rename(os.path.join(d, f), os.path.join(base, f"{i:02d}.parquet"))

    src = (
        spark.readStream.schema("user_id bigint, ts_s bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    q = (
        stateful_sessionize(src, gap_seconds=600)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions_out").collect()
    }
    # closed sessions only (each user's final session stays open in state):
    # u1: [0,50] then [1000,1500] closed by the 5000 event; [5000] open
    # u2: [10] closed; [1100,1300] open          u3: [1200] open
    assert got == {
        (1, 0, 50, 2, 3.0),
        (1, 1000, 1500, 2, 7.0),
        (2, 10, 10, 1, 5.0),
    }

    # batch twin agreement: every closed session appears identically in the
    # batch sessionization of the full data
    from hfsa_spark.streaming.snapshots import sessionize_events

    all_events = spark.read.parquet(base).withColumn(
        "ts", F.timestamp_seconds("ts_s")
    ).withColumn("user_id", F.col("user_id"))
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in sessionize_events(all_events, gap_minutes=10).collect()
    }
    assert got <= batch


def test_stateful_ewma_matches_batch(spark, tmp_path):
    """Streaming EWMA (horizon-deep ring state) emits exactly the batch
    ewma_smooth rows, across micro-batch boundaries."""
    from hfsa_spark.operators.events import ewma_smooth
    from hfsa_spark.streaming.stateful import stateful_ewma

    rows = [
        # 3 micro-batches; user 1's window spans all three
        [(1, 1, 0, 1.0), (2, 1, 10, 2.0), (3, 2, 5, 400.0)],
        [(4, 1, 20, 3.0), (5, 2, 30, 4.0)],
        [(6, 1, 40, 500.0), (7, 2, 50, 4.5)],
    ]
    base = str(tmp_path / "ewma_src")
    os.makedirs(base)
    for i, batch in enumerate(rows):
        df = spark.createDataFrame(
            batch, "event_id bigint, user_id bigint, ts_s bigint, value double"
        )
        df.coalesce(1).write.parquet(os.path.join(base, f"d{i}"))
        for f in os.listdir(os.path.join(base, f"d{i}")):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(base, f"d{i}", f),
                    os.path.join(base, f"{i:02d}.parquet"),
                )

    src = (
        spark.readStream.schema("event_id bigint, user_id bigint, ts_s bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    q = (
        stateful_ewma(src, horizon=4)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_id"]: (r["cents"], r["smooth_cents"], r["spike"])
        for r in spark.sql("select * from ewma_out").collect()
    }

    flat = [r for b in rows for r in b]
    bdf = spark.createDataFrame(
        flat, "event_id bigint, user_id bigint, ts_s bigint, value double"
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
    want = {
        r["event_id"]: (r["cents"], r["smooth_cents"], r["spike"])
        for r in ewma_smooth(bdf, horizon=4, order_cols=("ts", "event_id")).collect()
    }
    assert got == want and len(got) == 7
