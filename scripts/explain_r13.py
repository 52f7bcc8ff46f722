"""Dump `.explain("formatted")` for named queries into plans/r13/.

Usage: python scripts/explain_r13.py before q131_pagerank q155_bm25 ...
       python scripts/explain_r13.py after  q131_pagerank ...

Writes plans/r13/<query>_<tag>.txt — the committed evidence for the
round-12 optimization claims (OPTIMIZATION_r13.md). Uses sf0.01 (the
plan-shape SF used by PLANS.md) unless SPARK_GRAFT_SF_DIR is set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hfsa_spark import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_r13")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') @ {sf_dir} [{tag}]\n")
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
