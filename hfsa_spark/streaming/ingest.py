"""Continuous corpus ingestion: stream → dedup-vs-index → append.

The batch building block is operators/dedup.py::incremental_dedup (clean a
new batch against the persisted digest index). This module runs it
*continuously* via ``foreachBatch``: each micro-batch is deduped against
everything accepted so far (all prior batches included), survivors are
appended to the corpus, and their digests are appended to the index —
the loop a crawl-fed 100 TB training corpus runs forever.

Why ``foreachBatch`` and not a stateful operator: the digest index must
outlive the streaming query (it IS the corpus's dedup state, shared with
batch jobs and other queries), so it belongs in storage, not in the state
store. ``foreachBatch`` gives exactly-once appends per micro-batch id
with plain batch writers.

Scale notes:
* the index read inside each micro-batch is a single-column parquet scan;
  the anti join keys on the digest (co-partitioned shuffle, AQE sizes it);
* appends are partitioned-parquet friendly — pass ``partition_by`` to
  keep corpus files prunable;
* the index grows one small file per micro-batch — compact it
  periodically with sinks/layout.py::compact_to_target_size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hfsa_spark.operators.dedup import exact_dedup_groups, incremental_dedup


def ingest_batch(
    batch: DataFrame,
    index_path: str,
    corpus_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_by: list[str] | None = None,
) -> int:
    """One ingestion step: dedupe ``batch`` against the digest index at
    ``index_path`` (if it exists), append survivors to ``corpus_path`` and
    their digests to the index. Returns the number of accepted rows.
    Callable directly for batch backfills; the streaming path wraps it."""
    spark = batch.sparkSession
    if os.path.exists(index_path):
        index = spark.read.parquet(index_path)
        kept = incremental_dedup(batch, index, id_col, text_col)
    else:
        from hfsa_spark.operators.dedup import exact_dedup

        kept = exact_dedup(batch, id_col, text_col)
    # one deterministic pass: materialize survivors before the two appends
    # so the digest index and the corpus can never diverge
    kept = kept.localCheckpoint(eager=True)
    n = kept.count()
    if n == 0:
        return 0
    writer = kept.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(corpus_path)
    exact_dedup_groups(kept, id_col, text_col).select("digest").write.mode(
        "append"
    ).parquet(index_path)
    return n


def streaming_ingest_dedup(
    stream: DataFrame,
    index_path: str,
    corpus_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_by: list[str] | None = None,
    trigger_available_now: bool = True,
):
    """Run the ingestion loop over a streaming DataFrame. Returns the
    started StreamingQuery (caller awaits/stops it)."""

    def step(batch: DataFrame, _batch_id: int) -> None:
        ingest_batch(
            batch, index_path, corpus_path,
            id_col=id_col, text_col=text_col, partition_by=partition_by,
        )

    writer = stream.writeStream.foreachBatch(step).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
