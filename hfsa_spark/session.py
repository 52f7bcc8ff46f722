"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; at cluster scale the same configs apply —
AQE, adaptive partition coalescing, and skew-join handling are the knobs that
keep 100 TB plans healthy without hand-tuning per query.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hfsa_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``shuffle_partitions`` defaults to the core count locally; on a real
    cluster leave it to AQE (``spark.sql.adaptive.coalescePartitions``)
    which re-plans partition counts from runtime statistics.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    # Local-filesystem shim (r13): without libhadoop, Hadoop's
    # RawLocalFileSystem forks a shell ("chmod") for EVERY created file
    # and writes a .crc shadow per file through ChecksumFileSystem —
    # thread-dump sampling put ~5% of runnable task time in
    # ProcessImpl.forkAndExec under setPermission (parquet data files,
    # streaming WAL/checkpoint files). hfsa-localfs.jar (source in
    # java/, built by java/build.sh against the pyspark-bundled Hadoop
    # API) subclasses RawLocalFileSystem with a no-op setPermission and
    # is wired for the file:// scheme only — on a real cluster the data
    # filesystem is HDFS/S3 and none of this is in play.
    _jar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "jars", "hfsa-localfs.jar")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan (coalesce/skew-split) the stages that read a
        # persisted DataFrame: the engine's iterative/multi-consumer
        # operators (pagerank invariants, PPJoin shingle sets, bm25
        # postings, NB token counts) persist intermediates, and with this
        # off (Spark's default) every stage over a cached table is pinned
        # at spark.sql.shuffle.partitions regardless of size — near-empty
        # tasks at gate scale, under-sized partitions at 100 TB. With it
        # on, partition counts over cached data derive from runtime byte
        # sizes exactly like every other AQE stage (r12 A/B: 0.80x over
        # the cached-operator subset, no query slower).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # Use the sort-based shuffle writer for every shuffle (r13). The
        # bypass-merge writer (default for ≤200 reduce partitions) opens
        # one file PER REDUCE PARTITION per map task — 32×32 = 1024
        # creates + a concat + deletes per exchange; thread-dump sampling
        # during the bench put >80% of runnable task time in
        # FileOutputStream.open0 under DiskBlockObjectWriter (file
        # creation on this host costs ~200 µs and serializes across the
        # 32 writer threads). The sort path writes ONE data+index file
        # per map task. Scale-neutral by construction: at 100 TB every
        # real shuffle exceeds 200 partitions and already takes the sort
        # path — this only changes the small-shuffle regime where the
        # bypass writer's file-op fan-out is the dominant cost.
        .config("spark.shuffle.sort.bypassMergeThreshold", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if os.path.isfile(_jar):
        builder = (
            builder.config("spark.driver.extraClassPath", _jar)
            .config("spark.executor.extraClassPath", _jar)
            .config("spark.hadoop.fs.file.impl",
                    "hfsa.NoChmodRawLocalFileSystem")
            .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
                    "hfsa.NoChmodLocalFs")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
