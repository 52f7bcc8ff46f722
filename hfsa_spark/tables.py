"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a repeated big join (documents ⋈ embeddings,
inodes ⋈ edge lists, …) is the shuffle of both sides on every query.
Bucketing pays that shuffle ONCE at write time: both tables are written
pre-hash-partitioned (and optionally pre-sorted) on the join key into the
same number of buckets, and every subsequent equi join on that key is
planned with ZERO Exchange — each task reads matching bucket files from
both sides (tests/test_tables.py asserts the exchange-free plan).

This is the persistent complement to `extract`'s repartitionByRange write
(which optimizes range/prefix pruning; bucketing optimizes equi joins).
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_orphaned_location(spark: SparkSession, name: str) -> None:
    """If ``name`` is absent from the catalog but its default warehouse
    directory exists on disk (a previous session died between catalog and
    filesystem), remove the directory so saveAsTable can claim it. Only
    handles local file: warehouses — on a cluster with a durable metastore
    this state doesn't arise."""
    if spark.catalog.tableExists(name):
        return
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if warehouse.scheme not in ("", "file"):
        return
    loc = f"{warehouse.path}/{name.split('.')[-1].lower()}"
    shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a parquet table bucketed (and sorted) on
    ``bucket_cols``. Join two tables bucketed on the same key with the same
    ``num_buckets`` and Catalyst plans a shuffle-free sort-merge join;
    groupBy on the bucket key also skips its exchange."""
    _clear_orphaned_location(df.sparkSession, name)
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .format("parquet")
        .saveAsTable(name)
    )


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the catalog —
    a plain spark.read.parquet of the files would lose it)."""
    return spark.table(name)
