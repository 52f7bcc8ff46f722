"""CDC merge operators: upsert last-writer-wins semantics (join path ≡
broadcast path), delete/insert/update handling, SCD2 interval algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

BASE = [
    (1, "a", 10.0),
    (2, "b", 20.0),
    (3, "c", 30.0),
    (4, "d", 40.0),
]
# (k, v, price, op, ts, seq)
CHANGES = [
    (2, "b2", 21.0, "U", 1, 0),  # update
    (3, None, 0.0, "D", 1, 0),   # delete
    (5, "e", 50.0, "I", 1, 0),   # insert new key
    (2, "b3", 22.0, "U", 2, 0),  # later update wins over ts=1
    (4, "x", 0.0, "D", 1, 0),    # delete...
    (4, "d2", 41.0, "U", 2, 0),  # ...then re-upsert at ts=2 → survives
    (6, "f", 60.0, "I", 1, 0),   # insert...
    (6, None, 0.0, "D", 2, 1),   # ...then delete (same would-be day, seq wins)
]
EXPECTED = {
    1: ("a", 10.0),   # untouched
    2: ("b3", 22.0),  # last writer
    4: ("d2", 41.0),  # delete superseded
    5: ("e", 50.0),   # insert
}


def _frames(spark):
    base = spark.createDataFrame(BASE, "k bigint, v string, price double")
    ch = spark.createDataFrame(
        CHANGES, "k bigint, v string, price double, op string, ts int, seq int"
    )
    return base, ch


def test_upsert_merge_join_path(spark):
    from hfsa_spark.operators.cdc import upsert_merge

    base, ch = _frames(spark)
    out = upsert_merge(base, ch, ["k"], ts_col="ts", seq_col="seq")
    got = {r["k"]: (r["v"], r["price"]) for r in out.collect()}
    assert got == EXPECTED


def test_upsert_merge_broadcast_path_equivalent(spark):
    from hfsa_spark.operators.cdc import upsert_merge

    base, ch = _frames(spark)
    out = upsert_merge(
        base, ch, ["k"], ts_col="ts", seq_col="seq", broadcast_changes=True
    )
    got = {r["k"]: (r["v"], r["price"]) for r in out.collect()}
    assert got == EXPECTED
    assert out.columns == ["k", "v", "price"]


def test_upsert_merge_empty_changes_is_identity(spark):
    from hfsa_spark.operators.cdc import upsert_merge

    base, ch = _frames(spark)
    out = upsert_merge(base, ch.filter(F.lit(False)), ["k"])
    assert {r["k"] for r in out.collect()} == {1, 2, 3, 4}


def test_scd2_intervals(spark):
    from hfsa_spark.operators.cdc import scd2_intervals

    ch = spark.createDataFrame(
        [
            (1, "a1", "I", 10, 0),
            (1, "a2", "U", 20, 0),
            (1, "a3", "U", 30, 0),
            (2, "b1", "I", 10, 0),
            (2, None, "D", 25, 0),  # deleted key → no current row
            (3, "c1", "I", 15, 0),
        ],
        "k bigint, v string, op string, ts int, seq int",
    )
    out = scd2_intervals(ch, ["k"], ts_col="ts", op_col="op", seq_col="seq")
    rows = {
        (r["k"], r["valid_from"]): (r["v"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert rows == {
        (1, 10): ("a1", 20, False),
        (1, 20): ("a2", 30, False),
        (1, 30): ("a3", None, True),
        (2, 10): ("b1", 25, False),  # closed by the delete
        (3, 15): ("c1", None, True),
    }
    # the delete row itself emits no interval; key 2 has no current row
    assert not any(k == 2 and cur for (k, _), (_, _, cur) in rows.items())


def test_upsert_merge_null_op_ignored_on_both_paths(spark):
    from hfsa_spark.operators.cdc import upsert_merge

    base, _ = _frames(spark)
    ch = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U", 1, 0),
            (9, "ghost", 1.0, None, 1, 0),   # null-op insert: ignored
            (1, "phantom", 2.0, None, 2, 0),  # null-op update: ignored
            (3, "x", 3.0, "Z", 1, 0),        # unknown op: ignored
        ],
        "k bigint, v string, price double, op string, ts int, seq int",
    )
    expect = {1: "a", 2: "b2", 3: "c", 4: "d"}
    for bc in (False, True):
        out = upsert_merge(
            base, ch, ["k"], ts_col="ts", seq_col="seq", broadcast_changes=bc
        )
        assert {r["k"]: r["v"] for r in out.collect()} == expect, f"bc={bc}"


def test_point_in_time_join_semantics(spark):
    from hfsa_spark.operators.cdc import point_in_time_join

    iv = spark.createDataFrame(
        [
            (1, "v1", 10, 20, False),
            (1, "v2", 20, None, True),
            (2, "w1", 15, 25, False),  # key 2 deleted at 25: no current
        ],
        "k bigint, state string, valid_from int, valid_to int, is_current boolean",
    )
    facts = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 19), (1, 20), (1, 99), (2, 24), (2, 25), (3, 12)],
        "k bigint, ts int",
    )
    out = point_in_time_join(facts, iv, ["k"])
    got = {(r["k"], r["ts"]): r["state"] for r in out.collect()}
    assert got == {
        (1, 5): None,    # before first version
        (1, 10): "v1",   # inclusive lower bound
        (1, 19): "v1",
        (1, 20): "v2",   # exclusive upper bound
        (1, 99): "v2",   # open interval
        (2, 24): "w1",
        (2, 25): None,   # after delete
        (3, 12): None,   # unknown key
    }
    assert out.count() == 8  # at most one match per fact


def test_upsert_merge_schema_evolution_additive(spark):
    """evolve_schema=True: new feed columns append (NULL for untouched
    rows), base columns missing from the feed keep their base values on
    updates and are NULL on inserts — decided structurally, never from
    NULL values. All three apply paths agree."""
    from hfsa_spark.operators.cdc import upsert_merge

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, v string, score double",
    )
    # feed adds `lang`, drops `score`, updates k=2, deletes k=3, inserts k=4
    changes = spark.createDataFrame(
        [
            (2, "b2", "en", "U", 1, 0),
            (3, None, None, "D", 1, 1),
            (4, "d", "fr", "I", 1, 2),
        ],
        "k bigint, v string, lang string, op string, ts int, seq int",
    )
    expect = {
        1: ("a", 10.0, None),    # untouched: new col NULL
        2: ("b2", 20.0, "en"),   # updated: base-only score KEPT
        4: ("d", None, "fr"),    # insert: base-only score NULL
    }
    for kwargs in (
        {},
        {"broadcast_changes": True},
        {"skew_reduce": True},
        {"broadcast_changes": True, "null_safe_keys": False},
    ):
        out = upsert_merge(
            base, changes, ["k"], ts_col="ts", seq_col="seq",
            evolve_schema=True, **kwargs,
        )
        assert out.columns == ["k", "v", "score", "lang"]
        got = {
            r["k"]: (r["v"], r["score"], r["lang"]) for r in out.collect()
        }
        assert got == expect, kwargs

    # an explicit NULL in a column the feed DOES carry must still win
    # (structural absence, not NULL-ness, is what preserves base values)
    nullify = spark.createDataFrame(
        [(1, None, "de", "U", 1, 0)],
        "k bigint, v string, lang string, op string, ts int, seq int",
    )
    out = upsert_merge(base, nullify, ["k"], ts_col="ts", seq_col="seq",
                       evolve_schema=True)
    row = {r["k"]: (r["v"], r["score"], r["lang"]) for r in out.collect()}
    assert row[1] == (None, 10.0, "de")

    # flag off: strict contract unchanged (missing base column raises)
    import pytest as _pytest

    with _pytest.raises(Exception):
        upsert_merge(base, changes, ["k"], ts_col="ts", seq_col="seq").collect()
