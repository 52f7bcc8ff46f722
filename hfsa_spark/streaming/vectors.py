"""Streaming IVF vector-index maintenance: embeddings arrive, the
inverted-file index grows, queries keep serving.

The batch layout is operators/similarity.py::write_ivf_index (inverted
lists partitioned by ``list_id`` + a frozen ``_centroids`` table); this
module maintains that SAME layout continuously via ``foreachBatch`` —
the vector-search twin of streaming/index.py's inverted-text-index
maintenance, and the missing piece between "train the coarse quantizer
once" and "ingest embeddings forever":

* centroids are FROZEN up front (:func:`init_ivf_index`) — the standard
  production discipline: retraining the quantizer per batch would
  silently reshuffle every prior assignment;
* each micro-batch is assigned map-only against the frozen centroids
  and written with dynamic-partition OVERWRITE under
  ``ingest_batch_id=N/list_id=M`` — assignment is a pure function of
  (vector, centroids), so a replay of batch N rewrites exactly its own
  partitions with identical content: effective exactly-once, the
  q93/q164/q205 protocol;
* serving is the UNCHANGED :func:`ivf_topk_indexed` — probed lists
  prune to their partitions across all arrived batches.

Scale: per batch the work is one map-only assignment pass + a
partitioned append; nothing rescans the index. Merge accumulated
segments periodically with :func:`compact_ivf_index` (answers are
pytest-pinned identical before/after).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfsa_spark.operators.similarity import (
    _collect_centroids,
    _make_scorer,
    ivf_assign_arrow,
    l2_norm,
)
from hfsa_spark.plans import driver_listing, parallelize_compute, scan_width

BATCH_ID_COL = "ingest_batch_id"


def init_ivf_index(centroids: DataFrame, index_path: str,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> None:
    """Freeze the coarse quantizer: write ``<path>/_centroids`` (the
    underscore prefix keeps it out of parquet partition discovery)."""
    centroids.select(
        F.col(id_col).cast("long").alias("centroid_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/_centroids")


def index_vector_batch(
    batch: DataFrame,
    index_path: str,
    batch_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    expr_centroid_limit: int = 32,
    cent_rows=None,
) -> None:
    """One idempotent maintenance step: assign ``batch`` against the
    frozen centroids and dynamic-partition-overwrite its inverted-list
    rows under ``ingest_batch_id=batch_id``. Callable directly for batch
    backfills. ``cent_rows`` (from :func:`_collect_centroids` over the
    frozen table) lets a long-running caller skip the per-batch centroid
    re-read."""
    spark = batch.sparkSession
    if cent_rows is None:
        cent = spark.read.parquet(f"{index_path}/_centroids")
        cent_rows = _collect_centroids(cent, "centroid_id", "vec")
    # assignment fan-out sized from the batch's input BYTES (r12, guide
    # §2.2/§4): a streaming micro-batch is one tiny file — fanning it to
    # defaultParallelism ran 32 near-empty Python/codegen tasks per batch
    # (0.33–0.46 s each measured on q210) for work that is one matmul; a
    # multi-GB backfill still gets the full width.
    fanout = scan_width(batch)
    if len(cent_rows) <= expr_centroid_limit:
        scorer = _make_scorer(cent_rows)
        assigned = parallelize_compute(
            batch.select(id_col, vec_col), min_partitions=fanout
        ).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
            l2_norm(vec_col).alias("norm"),
        ).withColumn(
            "list_id",
            -F.array_max(scorer(F.col("vec"), F.col("norm")))["neg_id"],
        )
    else:
        cmat = [vec for _, vec, _ in cent_rows]
        cids = [cid for cid, _, _ in cent_rows]
        assigned = ivf_assign_arrow(
            batch, cmat, cids, id_col=id_col, vec_col=vec_col,
            include_vec=True, min_partitions=fanout,
        )
    # key the write on list_id: one file per (batch, list) instead of
    # tasks × lists small files — the write-amplification killer for
    # partitioned appends (and the locality the probe scan wants).
    # The shuffle width is sized EXPLICITLY (r12): repartition(col) falls
    # back to spark.sql.shuffle.partitions (32 here), and AQE does not
    # coalesce a user repartition — on a micro-batch that is ~32 near-
    # empty write tasks whose per-task commit overhead dominates the
    # whole apply (measured 2.5 s -> 0.9 s at width 8-16 on a 667-row
    # batch). Width: at least 16 (task-overhead floor), scaled up by the
    # incoming partition count for large backfills, capped at the list
    # count (partitionBy yields one file per list regardless).
    width = max(1, min(len(cent_rows), max(16, batch.rdd.getNumPartitions())))
    (
        assigned.repartition(width, F.col("list_id"))
        .withColumn(BATCH_ID_COL, F.lit(int(batch_id)))
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_ID_COL, "list_id")
        .mode("overwrite")
        .parquet(index_path)
    )


def streaming_ivf_index(
    vectors_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Wire a streaming embedding feed into the index maintenance loop.
    Returns the started StreamingQuery; :func:`init_ivf_index` must have
    frozen the centroids first. Serve with
    ``operators.similarity.ivf_topk_indexed(spark, index_path, ...)``."""
    # centroids are FROZEN, so read them once for the query's lifetime
    # instead of once per micro-batch
    spark = vectors_stream.sparkSession
    cent_rows = _collect_centroids(
        spark.read.parquet(f"{index_path}/_centroids"), "centroid_id", "vec"
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        index_vector_batch(
            batch, index_path, batch_id=int(batch_id),
            id_col=id_col, vec_col=vec_col, cent_rows=cent_rows,
        )

    return (
        vectors_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_ivf_index(spark: SparkSession, src_path: str, dst_path: str) -> None:
    """Merge a streaming-grown index (many ``ingest_batch_id=N``
    segment partitions) into a flat one-file-per-list index at
    ``dst_path`` — the Lucene-merge step for vectors: serving scans stop
    paying per-segment file opens as batch count grows. Write-to-new-dir
    keeps the source serveable throughout (swap by rename); the frozen
    ``_centroids`` table is copied verbatim so the compacted index is a
    drop-in :func:`~hfsa_spark.operators.similarity.ivf_topk_indexed`
    target. Queries answer identically before and after (pytest-pinned):
    compaction changes LAYOUT, never content."""
    # segmented roots span O(#batches × #lists) partition dirs — list
    # driver-side instead of paying Spark's parallel-listing jobs (r12)
    with driver_listing(spark):
        rows = spark.read.parquet(src_path).select("id", "vec", "norm", "list_id")
    # explicit shuffle width, same rationale as index_vector_batch (r12):
    # the list count comes from the frozen centroid table (one tiny scan)
    n_lists = spark.read.parquet(f"{src_path}/_centroids").count()
    width = max(1, min(int(n_lists), max(16, rows.rdd.getNumPartitions())))
    (
        rows.repartition(width, F.col("list_id"))
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(dst_path)
    )
    spark.read.parquet(f"{src_path}/_centroids").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{dst_path}/_centroids")
