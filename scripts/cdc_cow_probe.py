"""CDC copy-on-write granularity probe: snapshot-COW (rewrite the whole
snapshot per batch) vs bucket-COW (rewrite only touched buckets, untouched
buckets carried by manifest reference) — the evidence for
streaming/cdc.py's 100 TB posture: per-batch write volume must scale with
the TOUCHED-BUCKET count, not the corpus.

Three workload scenarios, because bucket-COW's win depends on change
locality, and the honest numbers show it:

* ``uniform_hash`` — a large uniformly-spread change batch over hash
  buckets: every bucket is touched, rewrite ≈ full snapshot (ratio ≈ 1).
  The documented degradation case — hash bucketing cannot exploit a
  batch with no key locality.
* ``clustered_range`` — a recency-local batch (only the top key range
  changes, the common CDC shape with monotoning pks) over RANGE buckets:
  touched buckets = the changed range, rewrite ∝ change locality.
* ``small_hash`` — a small batch (≪ n_buckets keys) over hash buckets:
  touched buckets ≈ distinct changed keys, rewrite ∝ batch size.

Usage:
    python scripts/cdc_cow_probe.py [n_rows] [n_buckets]
    # defaults: 2,000,000 64

Prints one JSON line with per-scenario per-batch rows and the
snapshot/bucket write-volume ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hfsa_spark import get_spark
from hfsa_spark.streaming.cdc import (
    append_change_segment,
    apply_change_batch,
    apply_change_batch_bucketed,
    init_base,
    init_snapshot,
    init_snapshot_bucketed,
    latest_snapshot,
    latest_snapshot_bucketed,
    read_merged,
)


def _dir_stats(path: str) -> tuple[int, int]:
    n_bytes = n_files = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n_bytes += os.path.getsize(os.path.join(root, f))
                n_files += 1
    return n_bytes, n_files


def _mk_batch(touched, i: int, n: int):
    """updates 5/6, deletes 1/6, plus inserts of unseen keys."""
    return touched.select(
        "k",
        (F.col("score") + 1 + i).alias("score"),
        F.lit(f"updated-{i}").alias("tag"),
        F.when(F.col("k") % 6 == 0, F.lit("D")).otherwise(F.lit("U")).alias(
            "op"
        ),
        F.lit(i + 1).alias("ts"),
    ).unionByName(
        touched.filter(F.col("k") % 6 == 1).select(
            (F.col("k") + n * (i + 1)).alias("k"),
            "score",
            F.lit(f"inserted-{i}").alias("tag"),
            F.lit("I").alias("op"),
            F.lit(i + 1).alias("ts"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_batches = 3
    spark = get_spark("cdc_cow_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.hash("id"), 1_000_000).cast("long").alias("score"),
            F.concat(F.lit("payload-"), (F.col("id") % 97).cast("string")).alias(
                "tag"
            ),
        )
        .persist()
    )
    base.count()

    scenarios = {
        # ~1% of keys, uniformly spread → touches every hash bucket
        "uniform_hash": dict(
            batches=[F.col("k") % 100 == i for i in range(n_batches)],
            init=dict(n_buckets=n_buckets, bucket_mode="hash"),
        ),
        # only the newest 1% key range changes → touches ~1% of range
        # buckets (range_width = n / n_buckets: same bucket count)
        "clustered_range": dict(
            batches=[
                (F.col("k") >= n - (i + 1) * n // 100)
                & (F.col("k") < n - i * n // 100)
                for i in range(n_batches)
            ],
            init=dict(n_buckets=n_buckets, bucket_mode="range",
                      range_width=max(n // n_buckets, 1)),
        ),
        # a 200-key batch over MANY hash buckets (batch keys ≪ buckets):
        # touched buckets ≈ distinct keys, rewrite ∝ batch size — the
        # regime where hash bucketing wins without any key locality
        "small_hash": dict(
            batches=[F.col("k") % (n // 200) == i for i in range(n_batches)],
            init=dict(n_buckets=4096, bucket_mode="hash"),
        ),
    }

    out_rows = []
    summary = {}
    for scen, cfg in scenarios.items():
        batches = [
            _mk_batch(base.filter(cond), i, n).persist()
            for i, cond in enumerate(cfg["batches"])
        ]
        batch_rows = [b.count() for b in batches]
        tmp = tempfile.mkdtemp(prefix=f"cow_{scen}_")
        totals = {"snapshot_cow": 0, "bucket_cow": 0}
        try:
            full = os.path.join(tmp, "full")
            buck = os.path.join(tmp, "buck")
            mor = os.path.join(tmp, "mor")
            init_snapshot(base, full)
            init_snapshot_bucketed(base, buck, ["k"], **cfg["init"])
            init_base(base, mor)
            totals["merge_on_read"] = 0

            for mode, apply_fn, vdir in (
                ("snapshot_cow",
                 lambda b, i: apply_change_batch(b, full, ["k"], batch_id=i),
                 lambda i: os.path.join(full, f"v={i + 1}")),
                ("bucket_cow",
                 lambda b, i: apply_change_batch_bucketed(b, buck, batch_id=i),
                 lambda i: os.path.join(buck, f"v={i + 1}")),
                ("merge_on_read",
                 lambda b, i: append_change_segment(b, mor, ["k"], batch_id=i),
                 lambda i: os.path.join(mor, f"seg={i}")),
            ):
                for i, b in enumerate(batches):
                    t0 = time.time()
                    apply_fn(b, i)
                    sec = round(time.time() - t0, 2)
                    nb, nf = _dir_stats(vdir(i))
                    totals[mode] += nb
                    out_rows.append({
                        "scenario": scen, "mode": mode, "batch": i,
                        "batch_rows": batch_rows[i], "sec": sec,
                        "mb_written": round(nb / 1e6, 1), "files_written": nf,
                    })

            # answers identical — the probe is meaningless if values diverge
            chk = lambda df: tuple(df.agg(
                F.count(F.lit(1)), F.sum("k"), F.sum("score")
            ).collect()[0])
            want = chk(latest_snapshot(spark, full))
            assert want == chk(
                latest_snapshot_bucketed(spark, buck)
            ), f"bucket-COW diverged in {scen}!"
            # merge-on-read pays its cost HERE: time the resolve too
            t0 = time.time()
            got_mor = chk(read_merged(spark, mor, ["k"]))
            mor_read_sec = round(time.time() - t0, 2)
            assert want == got_mor, f"merge-on-read diverged in {scen}!"
            summary[scen] = {
                "snapshot_over_bucket": round(
                    totals["snapshot_cow"] / max(totals["bucket_cow"], 1), 2
                ),
                "snapshot_over_mor": round(
                    totals["snapshot_cow"] / max(totals["merge_on_read"], 1),
                    2,
                ),
                "mor_read_sec": mor_read_sec,
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            for b in batches:
                b.unpersist()

    print(json.dumps({
        "probe": "cdc_cow", "n_rows": n, "n_buckets": n_buckets,
        "rows": out_rows, "write_volume_ratio_by_scenario": summary,
    }))


if __name__ == "__main__":
    main()
