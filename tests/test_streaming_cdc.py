"""Streaming CDC apply loop: versioned copy-on-write snapshots, replay
idempotency, end-to-end foreachBatch lifecycle."""

from __future__ import annotations

import os
import time

SCHEMA = "k bigint, v string, op string, ts int"


def _write_file(spark, base, idx, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        os.path.join(base, f"stage{idx}")
    )
    src = os.path.join(base, f"stage{idx}")
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            dst = os.path.join(base, f"{idx:02d}.parquet")
            os.rename(os.path.join(src, f), dst)
            t = time.time() - 3600 + idx * 60
            os.utime(dst, (t, t))


def _base(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )


def test_batch_apply_and_replay_idempotent(spark, tmp_path):
    from hfsa_spark.streaming.cdc import (
        apply_change_batch,
        init_snapshot,
        latest_snapshot,
    )

    snap = str(tmp_path / "snap")
    init_snapshot(_base(spark), snap)

    b0 = spark.createDataFrame([(2, "b2", "U", 1), (4, "d", "I", 1)], SCHEMA)
    b1 = spark.createDataFrame([(1, None, "D", 2), (4, "d2", "U", 2)], SCHEMA)
    apply_change_batch(b0, snap, ["k"], batch_id=0)
    apply_change_batch(b1, snap, ["k"], batch_id=1)
    expect = {2: "b2", 3: "c", 4: "d2"}
    got = {r["k"]: r["v"] for r in latest_snapshot(spark, snap).collect()}
    assert got == expect

    # replay of an already-committed batch converges to the same state
    apply_change_batch(b0, snap, ["k"], batch_id=0)
    got2 = {r["k"]: r["v"] for r in latest_snapshot(spark, snap).collect()}
    assert got2 == expect
    # version chain is intact: v=0,1,2 all committed
    assert sorted(
        d for d in os.listdir(snap) if d.startswith("v=")
    ) == ["v=0", "v=1", "v=2"]


def test_streaming_lifecycle(spark, tmp_path):
    from hfsa_spark.streaming.cdc import (
        init_snapshot,
        latest_snapshot,
        streaming_upsert_snapshots,
    )

    arrivals = str(tmp_path / "changes")
    os.makedirs(arrivals)
    _write_file(spark, arrivals, 0, [(2, "b2", "U", 1), (4, "d", "I", 1)])
    _write_file(spark, arrivals, 1, [(4, None, "D", 2), (5, "e", "I", 2)])
    _write_file(spark, arrivals, 2, [(5, "e2", "U", 3), (3, None, "D", 3)])

    snap = str(tmp_path / "snap")
    init_snapshot(_base(spark), snap)

    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
    )
    q = streaming_upsert_snapshots(
        src, snap, str(tmp_path / "ckpt"), ["k"], ts_col="ts", op_col="op"
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    got = {r["k"]: r["v"] for r in latest_snapshot(spark, snap).collect()}
    # 1:a untouched, 2 updated, 3 deleted in batch 2, 4 inserted then
    # deleted, 5 inserted then updated
    assert got == {1: "a", 2: "b2", 5: "e2"}
    # three batches → versions 0..3
    assert sorted(int(d.split("=")[1]) for d in os.listdir(snap)) == [0, 1, 2, 3]
