"""Inverted-index scale probe: build-once/serve-many BM25 at millions of
documents — quantifying what q161/q164 gate at fixture scale.

Measures, on a distributed-synthesized corpus (same zero-driver
``spark.range`` construction as dedup_scale_probe):

* index BUILD wall time (one-pass ``write_inverted_index``) and on-disk
  postings size,
* SERVE latency from the index (``bm25_topk_indexed``, pushed ``In(term)``
  filter) vs the FROM-SCRATCH scorer (``bm25_topk`` re-deriving tf/df/dl),
  min over repeats,
* result parity between the two paths (must be exact).

Usage:
    python scripts/index_scale_probe.py [n_docs]      # default 2,000,000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from hfsa_spark.operators.text import bm25_topk
from hfsa_spark.sinks.inverted_index import bm25_topk_indexed, write_inverted_index

W = 30        # words per doc
VOCAB = 30011


def synthesize_corpus(spark: SparkSession, n: int) -> DataFrame:
    """(doc_id, text): W pseudo-random words per doc from a 30k vocab —
    Zipf-free but collision-rich enough for real postings lists; fully
    distributed (one codegen'd expression over spark.range)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(W - 1)),
                    lambda i: F.concat(
                        F.lit("w"),
                        ((F.col("id") * 31 + i * 2654435761) % VOCAB).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from hfsa_spark import get_spark

    spark = get_spark("index_scale_probe")
    spark.sparkContext.setLogLevel("WARN")

    corpus = synthesize_corpus(spark, n)
    # materialize once so build/serve timings don't pay synthesis twice
    src = tempfile.mkdtemp(prefix="idxprobe_src_")
    idx = tempfile.mkdtemp(prefix="idxprobe_idx_")
    try:
        corpus.write.mode("overwrite").parquet(src)
        docs = spark.read.parquet(src)

        t0 = time.perf_counter()
        write_inverted_index(docs, idx, n_shards=32)
        build_s = round(time.perf_counter() - t0, 2)
        postings_mb = round(_dir_bytes(idx + "/postings") / 1e6, 1)

        qs = [(0, "w17"), (0, "w29000"), (1, "w5"), (1, "w123"), (2, "w999")]

        serve_s, scratch_s = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            served = bm25_topk_indexed(spark, idx, qs, k=10).collect()
            serve_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            scratch = bm25_topk(docs, qs, k=10).collect()
            scratch_s.append(time.perf_counter() - t0)
        parity = [tuple(r) for r in served] == [tuple(r) for r in scratch]

        print(
            json.dumps(
                {
                    "n_docs": n,
                    "build_s": build_s,
                    "postings_mb": postings_mb,
                    "serve_s_min": round(min(serve_s), 3),
                    "from_scratch_s_min": round(min(scratch_s), 3),
                    "speedup": round(min(scratch_s) / min(serve_s), 1),
                    "parity": parity,
                }
            )
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
