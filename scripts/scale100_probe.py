"""One 100x scale point for the two highest lifecycle exponents
(VERDICT r11 stretch 9): read_corpus measured 0.77 and ivf_build 0.68
over a 10x step, both expected ~linear — sub-linear readings at toy
sizes can be fixed-cost amortization masquerading as parallelism
headroom. A single 100x step (t1 base identical to
scripts/lifecycle_scale_probe.py) pins which it is: if the exponent
holds ~0.7-1.0 where fixed cost is negligible, the "sub-linear =
parallelism headroom" claim stands; an exponent rising past ~1.1 would
mean the toy reading was hiding super-linear work.

Usage: python scripts/scale100_probe.py [read_corpus|ivf_build ...]
Prints one JSON line per phase: t1, t100, exponent_100x
(= log(t100/t1)/log(100)).
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

from pyspark.sql import functions as F  # noqa: E402

from hfsa_spark import get_spark  # noqa: E402

WORK = tempfile.mkdtemp(prefix="hfsa_scale100_")
FACTOR = 100


def _rows(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )


def _vectors(spark, n: int, dim: int = 32):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d: F.sin(F.col("id") * d * 0.7 + d * d * 0.13),
        ).cast("array<double>").alias("embedding"),
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def probe_read_corpus(spark, out):
    """latest_snapshot_bucketed full scan, 200k/32 -> 20M/3200 (deploy
    rule: bucket size constant). Claim: linear in bytes."""
    from hfsa_spark.streaming.cdc import (
        init_snapshot_bucketed,
        latest_snapshot_bucketed,
    )

    t = {}
    for label, n, nb in (("t1", 200_000, 32), ("t100", 20_000_000, 3200)):
        snap = os.path.join(WORK, f"cow_{label}")
        init_snapshot_bucketed(_rows(spark, n), snap, ["k"], n_buckets=nb)
        t[label] = _timed(
            lambda: latest_snapshot_bucketed(spark, snap)
            .write.format("noop").mode("overwrite").save()
        )
    out("read_corpus", t)


def probe_ivf_build(spark, out):
    """index_vector_batch, 50k/32 -> 5M/3200 vectors/lists (deploy rule:
    list size constant). Claim: linear."""
    from hfsa_spark.streaming.vectors import index_vector_batch, init_ivf_index

    t = {}
    for label, n, nlist in (("t1", 50_000, 32), ("t100", 5_000_000, 3200)):
        idx = os.path.join(WORK, f"ivf_{label}")
        init_ivf_index(_vectors(spark, nlist), idx)
        vecs = _vectors(spark, n)
        t[label] = _timed(lambda: index_vector_batch(vecs, idx, batch_id=0))
    out("ivf_build", t)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("scale100_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def out(phase: str, t: dict) -> None:
        alpha = round(math.log(t["t100"] / t["t1"]) / math.log(FACTOR), 3)
        print(json.dumps({
            "phase": phase, "t1": round(t["t1"], 3),
            "t100": round(t["t100"], 3), "exponent_100x": alpha,
        }), flush=True)

    probes = {"read_corpus": probe_read_corpus, "ivf_build": probe_ivf_build}
    try:
        for name, fn in probes.items():
            if only and name not in only:
                continue
            fn(spark, out)
    finally:
        shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
