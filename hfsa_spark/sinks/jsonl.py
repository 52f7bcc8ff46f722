"""JSONL (newline-delimited JSON) corpus interchange.

The de-facto text-corpus format (one JSON object per line, gzip-friendly,
streamable). Spark's native json reader/writer already handles the heavy
lifting at scale; these wrappers pin the conventions a corpus release
needs — deterministic shard naming, stable column order, and a
round-trip-safe schema contract — so two runs of the same export are
diffable.

Scale: both directions are Spark-native (JVM json parser, full predicate
pushdown on read via schema projection; write is one file per shard task).
Only the post-write rename touches the driver (shard count many, bytes
zero — it renames, not copies).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    order_col: str | None = "doc_id",
) -> list[str]:
    """Write ``df`` as ``part-{i:05d}.jsonl`` shards under ``out_dir``.

    When ``order_col`` is given, rows are HASH-distributed across
    ``n_shards`` on that column (``repartition(n, col)``) and sorted by
    it within each shard, so shard membership depends only on the data —
    re-exports of identical data produce identical files regardless of
    upstream partitioning. With ``order_col=None`` the split is
    round-robin and NOT deterministic across different input layouts.
    Returns the shard paths."""
    staging = out_dir + "__stage"
    if order_col is not None:
        part = df.repartition(n_shards, order_col).sortWithinPartitions(order_col)
    else:
        part = df.repartition(n_shards)
    part.write.mode("overwrite").json(staging)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, src in enumerate(sorted(glob.glob(os.path.join(staging, "part-*")))):
        dst = os.path.join(out_dir, f"part-{i:05d}.jsonl")
        shutil.move(src, dst)
        paths.append(dst)
    shutil.rmtree(staging, ignore_errors=True)
    return paths


def read_jsonl(spark: SparkSession, in_dir: str, schema: str | None = None) -> DataFrame:
    """Read a JSONL directory (or glob). Passing ``schema`` skips the
    inference scan — ALWAYS do this at scale (inference reads everything
    once before the real read)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(os.path.join(in_dir, "*.jsonl"))
