"""Continuous CDC apply: a stream of change batches maintains a snapshot.

The batch building block is operators/cdc.py::upsert_merge (last-writer-
wins apply of one change batch). This module runs it *continuously* via
``foreachBatch``: each micro-batch of changes is merged against the
newest committed snapshot version and the result is committed as the
next version — the loop behind every warehouse table fed by a CDC feed
(Debezium/binlog-style I/U/D records).

Why ``foreachBatch`` and not a stateful operator: the snapshot must
outlive the streaming query (it IS the table, shared with batch readers)
so it belongs in storage, not the state store — the same argument as
streaming/ingest.py.

Exactly-once protocol (versioned copy-on-write):

* the snapshot directory holds immutable versions ``v=N``; version 0 is
  the initial base, micro-batch ``b`` commits version ``b+1``;
* a batch reads the newest version ``<= b`` THAT HAS ``_SUCCESS`` (a
  half-written version from a crash is invisible) and overwrites
  ``v=b+1`` atomically-enough (parquet job commit);
* a replay of batch ``b`` therefore re-reads the exact input the first
  attempt read and rewrites the same output version — idempotent
  convergence on top of an at-least-once trigger, q93/q164's protocol
  applied to table maintenance.

Scale notes: this is SNAPSHOT-granular copy-on-write — correct and
simple, and the whole snapshot is rewritten per batch. The production
refinement at 100 TB is FILE-granular COW (rewrite only files containing
touched keys, the Delta/Iceberg MERGE strategy): partition the snapshot
by a key bucket, join the change batch's bucket set, and union rewritten
buckets with untouched ones — the merge itself (upsert_merge) is
unchanged. Old versions are retained for time travel; vacuum by age.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hfsa_spark.operators.cdc import upsert_merge


def _committed_versions(snapshot_dir: str) -> list[int]:
    if not os.path.isdir(snapshot_dir):
        return []
    out = []
    for d in os.listdir(snapshot_dir):
        if d.startswith("v=") and os.path.exists(
            os.path.join(snapshot_dir, d, "_SUCCESS")
        ):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def latest_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Read the newest committed snapshot version."""
    vs = _committed_versions(snapshot_dir)
    if not vs:
        raise FileNotFoundError(f"no committed snapshot under {snapshot_dir}")
    return spark.read.parquet(os.path.join(snapshot_dir, f"v={vs[-1]}"))


def init_snapshot(base: DataFrame, snapshot_dir: str) -> None:
    """Commit ``base`` as version 0."""
    base.write.mode("overwrite").parquet(os.path.join(snapshot_dir, "v=0"))


def apply_change_batch(
    batch: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
    batch_id: int = 0,
) -> None:
    """One idempotent CDC step: merge ``batch`` into the newest committed
    version ``<= batch_id`` and commit the result as ``v={batch_id+1}``.
    Re-running with the same ``batch_id`` converges (module docstring).
    Callable directly for batch backfills."""
    spark = batch.sparkSession
    eligible = [v for v in _committed_versions(snapshot_dir) if v <= batch_id]
    if not eligible:
        raise FileNotFoundError(
            f"no committed snapshot version <= {batch_id} under {snapshot_dir}"
            " — call init_snapshot first"
        )
    prev = spark.read.parquet(os.path.join(snapshot_dir, f"v={eligible[-1]}"))
    merged = upsert_merge(
        prev, batch, key_cols, ts_col=ts_col, op_col=op_col, seq_col=seq_col
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(snapshot_dir, f"v={batch_id + 1}")
    )


def streaming_upsert_snapshots(
    changes_stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
):
    """Wire a streaming change feed into the versioned-snapshot apply
    loop. Returns the started StreamingQuery (caller awaits/stops).
    ``init_snapshot`` must have committed version 0 first."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        apply_change_batch(
            batch,
            snapshot_dir,
            key_cols,
            ts_col=ts_col,
            op_col=op_col,
            seq_col=seq_col,
            batch_id=int(batch_id),
        )

    return (
        changes_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
