"""Round-10 hardening: bounded re-plan-and-retry on the maintenance
writers' optimistic-concurrency aborts (ConcurrentWriteError), making
the entry points CONVERGE under a misconfigured double-scheduler
instead of merely failing safely.

Beyond-reference maintenance machinery (the reference, marcelmay/hfsa,
is read-only over one fsimage); mirrors the public Delta/Iceberg
commit-retry designs re-expressed over plain Spark DataFrames.

The races are injected DETERMINISTICALLY: the competitor's commit runs
inside a monkeypatched upsert_merge, i.e. exactly in the window between
the victim's head-read and its commit guard — no sleeps, no threads,
no flaky interleavings.
"""

from __future__ import annotations

import os

import pytest

SCHEMA = "k bigint, v string, op string, ts int"


def _base(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )


def _racing_scheduler(cdc, snap, b0, b1, fired):
    """The competitor: a second scheduler running the SAME batch
    sequence, which lands batches 0 AND 1 inside the victim's
    read-plan window (between its head-read and its commit guard)."""
    real_merge = cdc.upsert_merge

    def racing_merge(*a, **kw):
        if fired["n"] == 0:
            fired["n"] = 1
            cdc.apply_change_batch_bucketed(b0, snap, batch_id=0)
            cdc.apply_change_batch_bucketed(b1, snap, batch_id=1)
        return real_merge(*a, **kw)

    return racing_merge


def test_bucketed_apply_race_aborts_without_retries(spark, tmp_path, monkeypatch):
    """retries=0 (default): the guard converts the race into a loud
    ConcurrentWriteError (which IS a RuntimeError, preserving the r9
    contract). The committed head stays consistent: the competitor got
    both batches in, and the victim's identical deterministic rewrite
    of v=1's bucket dirs kept the v=2 manifest's references readable."""
    import hfsa_spark.streaming.cdc as cdc

    snap = str(tmp_path / "snap")
    cdc.init_snapshot_bucketed(_base(spark), snap, ["k"], n_buckets=4)
    b0 = spark.createDataFrame([(2, "b1", "U", 1)], SCHEMA)
    b1 = spark.createDataFrame([(4, "d", "I", 2)], SCHEMA)
    fired = {"n": 0}
    monkeypatch.setattr(
        cdc, "upsert_merge", _racing_scheduler(cdc, snap, b0, b1, fired)
    )
    with pytest.raises(cdc.ConcurrentWriteError, match="concurrent writer"):
        cdc.apply_change_batch_bucketed(b0, snap, batch_id=0)
    assert isinstance(
        cdc.ConcurrentWriteError("x"), RuntimeError
    )  # old catchers keep working
    got = {
        r["k"]: r["v"]
        for r in cdc.latest_snapshot_bucketed(spark, snap).collect()
    }
    assert got == {1: "a", 2: "b1", 3: "c", 4: "d"}


def test_bucketed_apply_race_converges_with_retries(spark, tmp_path, monkeypatch):
    """retries>0: attempt 1 aborts on the competitor's commits; the
    retry re-reads the head, sees it at-or-past our version (a later
    version can only exist if ours committed first under the sequential
    protocol), no-ops, and the head carries BOTH batches' effects."""
    import hfsa_spark.streaming.cdc as cdc

    snap = str(tmp_path / "snap")
    cdc.init_snapshot_bucketed(_base(spark), snap, ["k"], n_buckets=4)
    b0 = spark.createDataFrame([(2, "b1", "U", 1)], SCHEMA)
    b1 = spark.createDataFrame([(4, "d", "I", 2)], SCHEMA)
    fired = {"n": 0}
    monkeypatch.setattr(
        cdc, "upsert_merge", _racing_scheduler(cdc, snap, b0, b1, fired)
    )
    cdc.apply_change_batch_bucketed(b0, snap, batch_id=0, retries=2)

    got = {
        r["k"]: r["v"]
        for r in cdc.latest_snapshot_bucketed(spark, snap).collect()
    }
    assert got == {1: "a", 2: "b1", 3: "c", 4: "d"}
    # head is the competitor's v2; a later, unraced batch stacks cleanly
    cdc.apply_change_batch_bucketed(
        spark.createDataFrame([(1, "a2", "U", 3)], SCHEMA), snap, batch_id=2
    )
    got = {
        r["k"]: r["v"]
        for r in cdc.latest_snapshot_bucketed(spark, snap).collect()
    }
    assert got == {1: "a2", 2: "b1", 3: "c", 4: "d"}


def _racing_compactor(cdc, spark, table, fired):
    """The competitor: folds seg 0 (base v1), appends seg 1, folds it
    (base v2) — moving the committed head PAST anything the victim's
    own overwrite of _base_v=1 could wipe. Its post-compact vacuums are
    suppressed while the victim's lazy merge plan still references the
    old base's files (racing vacuum vs in-flight reader is exactly why
    the protocol is single-writer; the guard under test is the seatbelt)."""
    real_merge = cdc.upsert_merge

    def racing_merge(*a, **kw):
        if fired["n"] == 0:
            fired["n"] = 1
            cdc.compact_segments(spark, table, ["k"])
            cdc.append_change_segment(
                spark.createDataFrame([(3, "c2", "U", 2)], SCHEMA),
                table, ["k"], batch_id=1,
            )
            cdc.compact_segments(spark, table, ["k"])
        return real_merge(*a, **kw)

    return racing_merge


def test_compact_race_aborts_then_retry_noops(spark, tmp_path, monkeypatch):
    """A racing compactor lands TWO base versions while the victim
    merges; the victim's guard aborts (retries=0 raises), and with
    retries=1 the re-plan finds everything already folded and returns
    0 — content identical to the sequential outcome, debris vacuumed."""
    import hfsa_spark.streaming.cdc as cdc

    table = str(tmp_path / "mor")
    cdc.init_base(_base(spark), table)
    cdc.append_change_segment(
        spark.createDataFrame([(2, "b1", "U", 1)], SCHEMA),
        table, ["k"], batch_id=0,
    )

    fired = {"n": 0}
    real_vacuum = cdc.vacuum_segments
    monkeypatch.setattr(cdc, "vacuum_segments", lambda t: [])
    monkeypatch.setattr(
        cdc, "upsert_merge", _racing_compactor(cdc, spark, table, fired)
    )
    with pytest.raises(cdc.ConcurrentWriteError, match="concurrent compaction"):
        cdc.compact_segments(spark, table, ["k"])

    # retry path: re-plan sees all segments folded -> clean no-op
    assert cdc.compact_segments(spark, table, ["k"], retries=1) == 0

    got = {r["k"]: r["v"] for r in cdc.read_merged(spark, table, ["k"]).collect()}
    assert got == {1: "a", 2: "b1", 3: "c2"}
    # the victim's marker-less base dir is debris the real vacuum removes
    real_vacuum(table)
    bases = [d for d in os.listdir(table) if d.startswith("_base_v=")]
    assert len(bases) == 1  # only the committed head remains
    got = {r["k"]: r["v"] for r in cdc.read_merged(spark, table, ["k"]).collect()}
    assert got == {1: "a", 2: "b1", 3: "c2"}


def test_compact_race_converges_inline_with_retries(spark, tmp_path, monkeypatch):
    """Same race, but the victim carries retries=1 from the start: one
    call, converged result, no exception escapes."""
    import hfsa_spark.streaming.cdc as cdc

    table = str(tmp_path / "mor2")
    cdc.init_base(_base(spark), table)
    cdc.append_change_segment(
        spark.createDataFrame([(2, "b1", "U", 1)], SCHEMA),
        table, ["k"], batch_id=0,
    )

    fired = {"n": 0}
    monkeypatch.setattr(cdc, "vacuum_segments", lambda t: [])
    monkeypatch.setattr(
        cdc, "upsert_merge", _racing_compactor(cdc, spark, table, fired)
    )
    assert cdc.compact_segments(spark, table, ["k"], retries=1) == 0
    got = {r["k"]: r["v"] for r in cdc.read_merged(spark, table, ["k"]).collect()}
    assert got == {1: "a", 2: "b1", 3: "c2"}


def test_upsert_merge_strict_mode_rejects_missing_columns_loudly(spark):
    """With evolve_schema=False a batch MISSING base columns must fail
    at the API boundary with the drift named — not three operators
    deeper with an unresolved-column AnalysisException (found by the
    r10 vacuum-interleaving property test). EXTRA columns stay silently
    ignored: the pre-r9 pinned contract (feeds carry source metadata)."""
    from hfsa_spark.operators.cdc import upsert_merge

    base = spark.createDataFrame(
        [(1, "a", "x")], "k bigint, v string, w string"
    )
    narrow = spark.createDataFrame([(1, "b", "U", 1)], SCHEMA)
    with pytest.raises(ValueError, match=r"missing snapshot columns \['w'\]"):
        upsert_merge(base, narrow, ["k"])
    wide = spark.createDataFrame(
        [(1, "b", "z", "U", 1)],
        "k bigint, v string, extra string, op string, ts int",
    )
    out = upsert_merge(base.select("k", "v"), wide, ["k"])
    assert out.columns == ["k", "v"]  # extra ignored, schema unchanged
    assert {r["k"]: r["v"] for r in out.collect()} == {1: "b"}
    # evolve_schema=True accepts the narrow direction (existing contract)
    out = upsert_merge(base, narrow, ["k"], evolve_schema=True)
    assert {r["k"]: (r["v"], r["w"]) for r in out.collect()} == {1: ("b", "x")}
