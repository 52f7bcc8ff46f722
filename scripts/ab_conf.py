"""A/B a runtime SQLConf over a subset of gate queries in ONE session.

Usage: python scripts/ab_conf.py KEY VALUE_A VALUE_B q131_pagerank q155_bm25 ...

Each query runs (noop sink) twice per config in A,B,B,A block order; the
per-config min is reported. Warm-up at sf0.001 first (both configs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hfsa_spark import get_spark


def run_once(spark, fn, sf_dir):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    key, va, vb = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = "/root/testdata/sf0.001"
    spark = get_spark("ab_conf")
    qs = entrymod.queries()
    sel = [(n, qs[n]) for n in names]
    for cfg in (va, vb):
        spark.conf.set(key, cfg)
        for n, fn in sel:
            try:
                fn(spark, warm).write.format("noop").mode("overwrite").save()
            except Exception as exc:
                print(f"warmup {n} [{cfg}]: {exc}", file=sys.stderr)
    res = {n: {va: float("inf"), vb: float("inf")} for n, _ in sel}
    for cfg in (va, vb, vb, va):
        spark.conf.set(key, cfg)
        for n, fn in sel:
            el = run_once(spark, fn, sf_dir)
            res[n][cfg] = min(res[n][cfg], el)
    print(f"\n{key}: A={va} B={vb}")
    ta = tb = 0.0
    for n, d in res.items():
        ta += d[va]; tb += d[vb]
        print(f"  {n:35s} A={d[va]:7.3f}  B={d[vb]:7.3f}  B/A={d[vb]/d[va]:5.2f}")
    print(f"  {'TOTAL':35s} A={ta:7.3f}  B={tb:7.3f}  B/A={tb/ta:5.2f}")


if __name__ == "__main__":
    main()
