"""As-of join: semantics (backward/forward, ties, tolerance, no-match) and
plan shape (single shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "a"),
            ("u1", 20, "b"),
            ("u1", 5, "c"),   # before any right row
            ("u2", 10, "d"),  # u2 has no right rows at all
        ],
        "user string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 7, 70.0),
            ("u1", 10, 100.0),  # tie with left ts=10 → visible (ts >= semantics)
            ("u1", 15, 150.0),
        ],
        "user string, ts long, value double",
    )
    return left, right


def _collect(df):
    return {
        r["tag"]: (r["value_asof"], r["ts_asof"]) for r in df.collect()
    }


def test_backward_semantics(spark, frames):
    from hfsa_spark.operators.asof import asof_join

    left, right = frames
    out = asof_join(left, right, ts_col="ts", by_cols=["user"], value_cols=["value"])
    got = _collect(out)
    assert got["a"] == (100.0, 10)   # tie matches
    assert got["b"] == (150.0, 15)
    assert got["c"] == (None, None)  # nothing at or before 5
    assert got["d"] == (None, None)  # key with no right rows
    assert out.count() == left.count()


def test_forward_semantics(spark, frames):
    from hfsa_spark.operators.asof import asof_join

    left, right = frames
    out = asof_join(
        left, right, ts_col="ts", by_cols=["user"], value_cols=["value"], direction="forward"
    )
    got = _collect(out)
    assert got["a"] == (100.0, 10)   # tie matches forward too
    assert got["b"] == (None, None)  # nothing at or after 20
    assert got["c"] == (70.0, 7)
    assert got["d"] == (None, None)


def test_tolerance(spark, frames):
    from hfsa_spark.operators.asof import asof_join

    left, right = frames
    out = asof_join(
        left,
        right,
        ts_col="ts",
        by_cols=["user"],
        value_cols=["value"],
        tolerance_seconds=3,
    )
    got = _collect(out)
    assert got["a"] == (100.0, 10)   # lag 0 ≤ 3
    assert got["b"] == (None, None)  # lag 5 > 3 → nulled


def test_single_shuffle_plan(spark, frames):
    from hfsa_spark.operators.asof import asof_join
    from hfsa_spark.plans import num_exchanges

    left, right = frames
    out = asof_join(left, right, ts_col="ts", by_cols=["user"], value_cols=["value"])
    assert num_exchanges(out) == 1


def test_matches_sort_merge_reference(spark):
    """Randomized cross-check against a per-key Python merge."""
    import random

    rnd = random.Random(7)
    lrows = [("u%d" % rnd.randint(0, 4), rnd.randint(0, 100), i) for i in range(80)]
    rrows = [("u%d" % rnd.randint(0, 4), rnd.randint(0, 100), float(i)) for i in range(60)]
    left = spark.createDataFrame(lrows, "user string, ts long, tag int")
    right = (
        spark.createDataFrame(rrows, "user string, ts long, value double")
        # unique (key, ts) so the expected match is well-defined
        .groupBy("user", "ts").agg(F.max("value").alias("value"))
    )
    from hfsa_spark.operators.asof import asof_join

    out = asof_join(left, right, ts_col="ts", by_cols=["user"], value_cols=["value"])
    got = {r["tag"]: r["value_asof"] for r in out.collect()}

    rmap = {}
    for r in right.collect():
        rmap.setdefault(r["user"], []).append((r["ts"], r["value"]))
    for k in rmap:
        rmap[k].sort()
    for user, ts, tag in lrows:
        best = None
        for rts, rv in rmap.get(user, []):
            if rts <= ts:
                best = rv
        assert got[tag] == best, (user, ts, tag)


def test_asof_null_value_row_is_matched_atomically(spark):
    """A right row whose value column is genuinely NULL is still THE match
    for later left rows: (value_asof, ts_asof) must come from one right
    row, never stitched from two (ADVICE r1: struct-atomic fill)."""
    from hfsa_spark.operators.asof import asof_join

    left = spark.createDataFrame([("a", 30)], ["k", "ts"])
    right = spark.createDataFrame(
        [("a", 10, 100), ("a", 20, None)],
        "k string, ts int, v int",
    )
    row = asof_join(left, right, ts_col="ts", by_cols=["k"]).collect()[0]
    assert row["ts_asof"] == 20       # nearest right row
    assert row["v_asof"] is None      # ... whose value is genuinely null
