"""Scale-exponent probe for the LIFECYCLE families (r10 VERDICT
next-round #4): the batch queries got empirical 10x exponents in
scripts/scale_exponent_probe.py; the CDC / merge-on-read / IVF
maintenance gates' 100 TB posture still rested on plan shape + locality
probes. This measures it: each maintenance phase timed at a base scale
and at 10x along the dimension that actually grows in production, and
reported as alpha = log(t10/t1)/log(10). Same rule as the batch probe:
alpha > 1.3 earns a plan investigation or an honest posture note in
PERFORMANCE.md.

Dimensions and their deploy-time scaling rules (what the 100 TB claim
actually is — stated per phase so a flat/linear verdict is interpretable):

* apply_corpus      — corpus 10x AND n_buckets 10x (the deploy rule:
                      bucket SIZE held constant), change batch fixed.
                      Claim: apply cost ~ O(touched buckets x bucket
                      size), so ~FLAT in corpus (alpha ~ 0).
* apply_batchvol    — corpus fixed, change volume 10x. Claim: ~linear
                      or better (touched-bucket count saturates).
* read_corpus       — latest_snapshot_bucketed full read at 10x corpus.
                      Claim: linear (it reads 10x the bytes) — alpha ~ 1
                      is the HONEST expectation, not a failure.
* vacuum_versions   — 10x more committed versions, vacuum to keep=1.
                      Claim: ~linear in version count (listing + dir
                      removal), independent of corpus bytes retained.
* mor_read_segments — merge-on-read resolve at 10x unfolded segments
                      (fixed corpus + segment size). Claim: ~linear in
                      segment count (the documented read amplification).
* mor_compact       — compact 10x segments. Claim: ~linear in folded
                      data volume.
* ivf_build         — index 10x vectors with nlist scaled 10x (deploy
                      rule: list size constant). Claim: ~linear.
* ivf_serve         — fixed queries/n_probe against the 10x index.
                      Claim: ~FLAT (partition-pruned to n_probe lists of
                      constant size).

Usage: python scripts/lifecycle_scale_probe.py [phase ...]
One JSON line per phase; summary table at the end.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hfsa_spark import get_spark

from pyspark.sql import functions as F

FACTOR = 10
WORK = tempfile.mkdtemp(prefix="hfsa_lifecycle_probe_")


def _rows(spark, n: int):
    """Deterministic (k, v) corpus of n rows."""
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )


def _batch(spark, keys, tag: str, n_corpus: int):
    """Change batch updating `keys` spread uniformly over the keyspace."""
    rows = [(int(k) % n_corpus, f"{tag}-{i}", "U", i) for i, k in enumerate(keys)]
    return spark.createDataFrame(rows, "k bigint, v string, op string, ts int")


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# ----------------------------------------------------------- phases --

def probe_bucketed(spark, out):
    from hfsa_spark.streaming.cdc import (
        apply_change_batch_bucketed,
        init_snapshot_bucketed,
        latest_snapshot_bucketed,
        vacuum_buckets,
    )

    scales = {}  # label -> (corpus_rows, n_buckets, snap_dir)
    for label, n, nb in (("t1", 200_000, 32), ("t10", 2_000_000, 320)):
        snap = os.path.join(WORK, f"cow_{label}")
        init_snapshot_bucketed(_rows(spark, n), snap, ["k"], n_buckets=nb)
        scales[label] = (n, nb, snap)

    # apply_corpus: fixed 16-key batch, corpus+buckets 10x — deploy rule
    t = {}
    for label, (n, nb, snap) in scales.items():
        keys = [i * (n // 16) + 7 for i in range(16)]
        b = _batch(spark, keys, f"ac-{label}", n)
        t[label] = _timed(
            lambda: apply_change_batch_bucketed(b, snap, batch_id=0)
        )
    out("apply_corpus", t)

    # read_corpus: full latest read (count() forces the scan)
    t = {}
    for label, (n, nb, snap) in scales.items():
        t[label] = _timed(
            lambda: latest_snapshot_bucketed(spark, snap).write.format(
                "noop"
            ).mode("overwrite").save()
        )
    out("read_corpus", t)

    # apply_batchvol: fixed big corpus, change volume 30 -> 300 keys
    n, nb, snap = scales["t10"]
    t = {}
    for label, nkeys, bid in (("t1", 30, 1), ("t10", 300, 2)):
        keys = [i * (n // nkeys) + 13 for i in range(nkeys)]
        b = _batch(spark, keys, f"bv-{label}", n)
        t[label] = _timed(
            lambda: apply_change_batch_bucketed(b, snap, batch_id=bid)
        )
    out("apply_batchvol", t)

    # vacuum_versions: 4 vs 40 committed versions, vacuum to keep=1.
    # Fresh small snapshots so retained bytes are equal on both sides.
    t = {}
    for label, nvers in (("t1", 4), ("t10", 40)):
        snap = os.path.join(WORK, f"vac_{label}")
        init_snapshot_bucketed(_rows(spark, 50_000), snap, ["k"], n_buckets=32)
        for i in range(nvers):
            b = _batch(spark, [i * 997 + 3, i * 991 + 11], f"vv{i}", 50_000)
            apply_change_batch_bucketed(b, snap, batch_id=i)
        t[label] = _timed(lambda: vacuum_buckets(snap, keep_latest=1))
    out("vacuum_versions", t)


def probe_mor(spark, out):
    from hfsa_spark.streaming.cdc import (
        append_change_segment,
        compact_segments,
        init_base,
        read_merged,
    )

    for label, nseg in (("t1", 5), ("t10", 50)):
        table = os.path.join(WORK, f"mor_{label}")
        init_base(_rows(spark, 200_000), table)
        for i in range(nseg):
            b = _batch(
                spark, [i * 1009 + j * 37 for j in range(200)],
                f"s{i}", 200_000,
            )
            append_change_segment(b, table, ["k"], batch_id=i)

    t_read, t_compact = {}, {}
    for label in ("t1", "t10"):
        table = os.path.join(WORK, f"mor_{label}")
        t_read[label] = _timed(
            lambda: read_merged(spark, table, ["k"]).write.format(
                "noop"
            ).mode("overwrite").save()
        )
    out("mor_read_segments", t_read)
    for label in ("t1", "t10"):
        table = os.path.join(WORK, f"mor_{label}")
        t_compact[label] = _timed(
            lambda: compact_segments(spark, table, ["k"])
        )
    out("mor_compact", t_compact)


def _vectors(spark, n: int, dim: int = 32):
    # deterministic pseudo-random unit-ish vectors, JVM-side
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d: F.sin(F.col("id") * d * 0.7 + d * d * 0.13),
        ).cast("array<double>").alias("embedding"),
    )


def probe_ivf(spark, out):
    from hfsa_spark.operators.similarity import ivf_topk_indexed
    from hfsa_spark.streaming.vectors import index_vector_batch, init_ivf_index

    queries = _vectors(spark, 8).cache()
    queries.count()

    t_build, t_serve = {}, {}
    for label, n, nlist in (("t1", 50_000, 32), ("t10", 500_000, 320)):
        idx = os.path.join(WORK, f"ivf_{label}")
        cents = _vectors(spark, nlist)
        init_ivf_index(cents, idx)
        vecs = _vectors(spark, n)
        t_build[label] = _timed(
            lambda: index_vector_batch(vecs, idx, batch_id=0)
        )
        t_serve[label] = _timed(
            lambda: ivf_topk_indexed(
                spark, idx, queries, k=5, n_probe=4,
            ).write.format("noop").mode("overwrite").save()
        )
    out("ivf_build", t_build)
    out("ivf_serve", t_serve)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("lifecycle_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []

    def out(phase: str, t: dict) -> None:
        alpha = round(math.log(t["t10"] / t["t1"]) / math.log(FACTOR), 3)
        rec = {
            "phase": phase,
            "t1": round(t["t1"], 3),
            "t10": round(t["t10"], 3),
            "exponent": alpha,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    probes = {
        "bucketed": probe_bucketed,
        "mor": probe_mor,
        "ivf": probe_ivf,
    }
    try:
        for name, fn in probes.items():
            if only and name not in only:
                continue
            fn(spark, out)
    finally:
        shutil.rmtree(WORK, ignore_errors=True)
    print(json.dumps({"summary": rows}, indent=1))


if __name__ == "__main__":
    main()
