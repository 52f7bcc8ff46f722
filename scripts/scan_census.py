"""Census of plan shapes over every declared query: parquet-scan count,
exchange count, and Python-eval nodes per query (sf0.01 plans). The
repeated-subtree smell is scans >> distinct tables touched.

Usage: python scripts/scan_census.py [sf_dir] > /tmp/census.txt
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hfsa_spark import get_spark
from hfsa_spark.plans import explain_str


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scan_census")
    rows = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = explain_str(df, "formatted")
        except Exception as exc:
            rows.append((name, -1, -1, -1, f"ERROR {exc}"[:60]))
            continue
        scans = len(re.findall(r"Scan parquet", plan))
        exch = len(re.findall(r"\bExchange\b", plan)) - len(
            re.findall(r"ReusedExchange", plan))
        pyeval = len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan))
        mem = len(re.findall(r"InMemoryTableScan", plan))
        rows.append((name, scans, exch, pyeval, f"inmem={mem}"))
    rows.sort(key=lambda r: -r[1])
    for name, scans, exch, pyeval, note in rows:
        print(f"{scans:3d} scans {exch:3d} exch {pyeval:2d} pyeval  {name}  {note}")


if __name__ == "__main__":
    main()
