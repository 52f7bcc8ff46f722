"""Scale probe: the reference documents a 20,306-dir / 5,279,560-file
namespace (~270 MiB image) as its larger scale point but never benchmarks
it (FsImageGenerator.java:47-53 comment, BASELINE.md). This script actually
runs it: generate that namespace distributed, extract to partitioned
parquet, and time each report — evidence that the plans scale linearly
(25× the JMH dataset) rather than hitting a wall.

Usage: python scripts/scale_probe.py [out_dir]  (default /tmp/hfsa_scale_5m)
Prints one JSON line with extract + per-report wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hfsa_spark import get_spark
from hfsa_spark.extract import generated_namespace
from hfsa_spark.extract.pathmat import write_inodes


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hfsa_scale_5m"
    spark = get_spark("hfsa_scale_probe")
    timings: dict[str, float] = {}

    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        t0 = time.perf_counter()
        ns = generated_namespace(
            spark, max_depth=5, max_width=6, files_per_dir_factor=10,
            num_users=10, num_groups=5,
        )
        write_inodes(ns, out)
        timings["extract_5m"] = round(time.perf_counter() - t0, 2)

    inodes = spark.read.parquet(out)
    timings["n_inodes"] = inodes.count()

    from hfsa_spark.operators.inodeinfo import inode_info
    from hfsa_spark.operators.pathreport import path_report
    from hfsa_spark.operators.smallfiles import small_files_report
    from hfsa_spark.operators.summary import summary_report
    from hfsa_spark.operators.userusage import user_usage_report

    def run(name, thunk):
        for _ in range(3):  # min-of-3: steady state, not first-touch codegen
            t0 = time.perf_counter()
            thunk()
            el = round(time.perf_counter() - t0, 2)
            timings[name] = min(timings.get(name, el), el)

    def _stat():
        try:
            with open("/proc/stat") as fh:
                parts = fh.readline().split()
            return int(parts[8]), sum(int(x) for x in parts[1:])
        except Exception:
            return -1, 0

    steal0, jif0 = _stat()
    run("summary", lambda: summary_report(inodes).by_user.collect())
    run(
        "smallfiles",
        lambda: small_files_report(inodes, limit_bytes=2 * 1024 * 1024).path_hotspots.collect(),
    )
    run(
        "userusage",
        lambda: user_usage_report(inodes, user="user3", now_ms=1600000000000).collect(),
    )
    run("path_subtree", lambda: path_report(inodes, dirs=["/a"]).counts.collect())
    run("inode_lookup", lambda: inode_info(inodes, [16385, "/a/g"]).collect())

    steal1, jif1 = _stat()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / max(jif1 - jif0, 1), 2)
        if steal0 >= 0 and jif1 > jif0
        else None
    )
    print(
        json.dumps(
            {
                "metric": "scale_probe_5m",
                "unit": "sec",
                "steal_pct": steal_pct,
                "timings": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
