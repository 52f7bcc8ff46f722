"""Regression tripwire for the driver-harness events loader.

Round-2 lesson: the driver's events.parquet encoding changed between rounds
(raw INT64 nanos -> proper timestamp[us]) and a hard-coded unit assumption in
``__spark_entry__._events`` silently compressed every timestamp 1000x, failing
five gate queries (q31/q32/q43/q58/q64) whose operators were all correct.

These tests write BOTH encodings with pyarrow in-test and assert ``_events``
recovers identical epoch values from each — the harness must be unit-agnostic
by construction, not by assumption.
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entrymod


# Distinct wall-clock times spanning hours (epoch seconds, 2024-01-01 base).
_BASE = 1_704_067_200
_EPOCH_S = [_BASE, _BASE + 11, _BASE + 3601, _BASE + 7333, _BASE + 86_400]


def _write_events(path: str, ts_array: pa.Array) -> None:
    n = len(_EPOCH_S)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([i % 2 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
            "props": pa.array(['{"k": 1}'] * n),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture(scope="module")
def us_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_us")
    _write_events(
        str(d / "events.parquet"),
        pa.array([s * 1_000_000 for s in _EPOCH_S], pa.int64()).cast(
            pa.timestamp("us")
        ),
    )
    return str(d)


@pytest.fixture(scope="module")
def ns_dir(tmp_path_factory):
    # Raw INT64 nanos — the r1/r2-era encoding (TIMESTAMP(NANOS) physical).
    d = tmp_path_factory.mktemp("events_ns")
    _write_events(
        str(d / "events.parquet"),
        pa.array([s * 1_000_000_000 for s in _EPOCH_S], pa.int64()),
    )
    return str(d)


def _epochs(spark, sf_dir):
    from pyspark.sql import functions as F

    df = entrymod._events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    return [
        r["e"]
        for r in df.select(F.col("ts").cast("long").alias("e"))
        .orderBy("e")
        .collect()
    ]


def test_events_us_encoding(spark, us_dir):
    assert _epochs(spark, us_dir) == _EPOCH_S


def test_events_ns_encoding(spark, ns_dir):
    assert _epochs(spark, ns_dir) == _EPOCH_S


def test_unit_sniff(us_dir, ns_dir):
    assert entrymod._events_ts_unit(us_dir) == "ts"
    assert entrymod._events_ts_unit(ns_dir) == "ns"


def test_time_granular_query_both_encodings(spark, us_dir, ns_dir):
    """A q31-shaped hour bucketing must yield identical buckets per encoding
    (the r2 failure mode: unit mis-scaling collapses all rows into one hour)."""
    from pyspark.sql import functions as F

    def buckets(sf_dir):
        df = entrymod._events(spark, sf_dir)
        return sorted(
            r["b"]
            for r in df.select(
                F.floor(F.col("ts").cast("long") / 3600).cast("long").alias("b")
            )
            .distinct()
            .collect()
        )

    expect = sorted({s // 3600 for s in _EPOCH_S})
    assert buckets(us_dir) == expect
    assert buckets(ns_dir) == expect


def test_events_timezone_independent(spark, us_dir):
    """The driver builds its own session; its timezone must not shift event
    epochs (the explicit-TIMESTAMP-schema read maps stored micros straight
    to epoch micros)."""
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert _epochs(spark, us_dir) == _EPOCH_S
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
