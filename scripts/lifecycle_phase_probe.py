"""Phase-level timing of the three most expensive lifecycle gates
(VERDICT r11 #5: q210 7.48 s / q213 6.66 s / q212 4.92 s are ~30 s of
every bench pass on toy data; the r11 scale probe proved the SERVE and
APPLY paths scale flat, so whatever remains is per-run fixed cost —
find out exactly which phase carries it before cutting anything).

Usage: python scripts/lifecycle_phase_probe.py [SF_DIR]

Each gate is decomposed into its real phases (stage arrival files, init
base layout, run the streaming/backfill lifecycle, final read+serve) by
re-running the gate's exact body with timers between phases. Prints one
JSON line per gate. Run twice and read the second line per gate — the
first pays session/codegen warm-up like any cold query.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from hfsa_spark import get_spark  # noqa: E402


def probe_q210(spark, sf_dir):
    from hfsa_spark.operators.similarity import ivf_topk_indexed
    from hfsa_spark.streaming.vectors import init_ivf_index, streaming_ivf_index

    emb = entry._t(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="probe210_")
    t = {}
    try:
        t0 = time.perf_counter()
        src_dir = os.path.join(tmp, "arrivals")
        for k in range(3):
            entry._stage_arrival_file(
                emb.filter(F.col("vec_id") % 3 == k).select("vec_id", "embedding"),
                src_dir, k)
        t["stage_arrivals"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        idx = os.path.join(tmp, "ivf")
        init_ivf_index(emb.filter(F.col("vec_id") % 25 == 0), idx)
        t["init_centroids"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        src = (spark.readStream.schema("vec_id bigint, embedding array<float>")
               .option("maxFilesPerTrigger", 1).parquet(src_dir))
        q = streaming_ivf_index(src, idx, os.path.join(tmp, "ckpt"))
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
        t["stream_3_batches"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        qs = emb.filter(F.col("vec_id").isin(0, 1, 2))
        ivf_topk_indexed(spark, idx, qs, k=5, n_probe=2).collect()
        t["serve"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t


def probe_q212(spark, sf_dir):
    from hfsa_spark.streaming.cdc import (
        init_snapshot_bucketed,
        latest_snapshot_bucketed,
        streaming_upsert_snapshots_bucketed,
    )

    od = entry._t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="probe212_")
    t = {}
    try:
        t0 = time.perf_counter()
        src_dir = os.path.join(tmp, "changes")
        for k, b in enumerate(entry._q205_change_batches(od)):
            entry._stage_arrival_file(b, src_dir, k)
        t["stage_arrivals"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        snap = os.path.join(tmp, "snapshot")
        init_snapshot_bucketed(od, snap, ["o_orderkey"], n_buckets=16)
        t["init_snapshot"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        src = (spark.readStream.schema(
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
            " o_totalprice double, op string, ts int")
            .option("maxFilesPerTrigger", 1).parquet(src_dir))
        q = streaming_upsert_snapshots_bucketed(
            src, snap, os.path.join(tmp, "ckpt"), ts_col="ts", op_col="op")
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
        t["stream_batches"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        final = latest_snapshot_bucketed(spark, snap)
        final.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).alias("c"),
            F.sum("o_orderkey").alias("k"),
        ).collect()
        t["final_read_agg"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t


def probe_q213(spark, sf_dir):
    from hfsa_spark.operators.similarity import (
        _collect_centroids,
        ivf_topk_indexed,
    )
    from hfsa_spark.streaming.vectors import (
        compact_ivf_index,
        index_vector_batch,
        init_ivf_index,
    )

    emb = entry._t(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="probe213_")
    t = {}
    try:
        t0 = time.perf_counter()
        idx = os.path.join(tmp, "ivf")
        init_ivf_index(emb.filter(F.col("vec_id") % 25 == 0), idx)
        cent_rows = _collect_centroids(
            spark.read.parquet(f"{idx}/_centroids"), "centroid_id", "vec")
        t["init_centroids"] = time.perf_counter() - t0

        for k in range(2):
            t0 = time.perf_counter()
            index_vector_batch(
                emb.filter(F.col("vec_id") % 2 == k).select("vec_id", "embedding"),
                idx, batch_id=k, cent_rows=cent_rows)
            t[f"backfill_batch_{k}"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        compacted = os.path.join(tmp, "ivf_compacted")
        compact_ivf_index(spark, idx, compacted)
        t["compact"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        qs = emb.filter(F.col("vec_id").isin(0, 1, 2))
        ivf_topk_indexed(spark, compacted, qs, k=5, n_probe=2).collect()
        t["serve"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lifecycle-phase-probe")
    for name, fn in [("q210", probe_q210), ("q212", probe_q212),
                     ("q213", probe_q213)]:
        for rep in range(2):
            t = fn(spark, sf_dir)
            print(json.dumps({
                "gate": name, "rep": rep, "sf_dir": sf_dir,
                "total": round(sum(t.values()), 3),
                "phases": {k: round(v, 3) for k, v in t.items()},
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
