"""Empirical scale-exponent probe (r9 VERDICT next-round #4).

The 100x-scale grading so far rests on plan shape plus targeted probes;
this measures it: run the N most expensive batch queries at sf0.1 and at
a deterministic 10x synthetic built FROM sf0.1, and report each query's
wall-time scaling exponent  alpha = log(t_10x / t_1x) / log(10).
alpha ~ 1.0 = linear; > 1.3 earns a plan investigation (or an honest
posture note) in PERFORMANCE.md.

The 10x corpus must preserve workload SHAPE, not just row count:

* documents: each replica's text goes through a per-replica LETTER
  PERMUTATION (a Caesar rotation over [a-z] and [A-Z]). Within a
  replica, duplicate/near-duplicate structure is EXACTLY isomorphic to
  sf0.1 (dedup queries see the same per-replica pair density); across
  replicas, shingle overlap collapses to ~zero — naive replication
  would give every doc 9 near-identical twins and inflate candidate
  volume ~100x for 10x data, which is NOT how real corpora grow.
* embeddings: per-replica circular shift of the vector dimensions —
  within-replica cosine structure identical, cross-replica similarity
  scrambled.
* lineitem/orders: key-shifted replicas (orderkey/custkey/suppkey all
  shifted per replica) — the derived bipartite graph becomes 10
  disconnected sf0.1-shaped components, which is how a 10x business
  actually looks to PageRank.

Usage:
    python scripts/scale_probe.py [--build-only] [--runs N] [q...]
Writes one JSON line per query to stdout and a summary table at the end.
"""

from __future__ import annotations

import json
import math
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hfsa_spark import get_spark

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/hfsa_sfx10")
REPLICAS = 10

# the 10 most expensive batch queries of the committed r9 record
DEFAULT_QUERIES = [
    "q131_pagerank",
    "q216_pagerank_dangling",
    "q184_containment_join",
    "q176_setsim_join",
    "q161_bm25_indexed",
    "q137_link_pagerank",
    "q148_neardup_safe_split",
    "q155_bm25",
    "q163_neardup_keeper",
    "q154_nb_classifier",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _rot_alphabet(i: int) -> tuple[str, str]:
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    j = i % 26
    return lo + up, lo[j:] + lo[:j] + up[j:] + up[:j]


def build(spark) -> None:
    """Materialize the 10x corpus once (content-addressed by source mtime
    is overkill here — a marker file with the source path suffices)."""
    marker = os.path.join(DST, "_BUILT.json")
    if os.path.exists(marker):
        return
    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t == "documents":
            n = df.agg(F.max("doc_id")).collect()[0][0] + 1
            reps = []
            for i in range(REPLICAS):
                src_a, dst_a = _rot_alphabet(i)
                reps.append(
                    df.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
                    .withColumn("text", F.translate(F.col("text"), src_a, dst_a))
                )
            out = reps[0]
            for r in reps[1:]:
                out = out.unionByName(r)
        elif t == "embeddings":
            n = df.agg(F.max("vec_id")).collect()[0][0] + 1
            dim_col = next(
                f.name for f in df.schema.fields
                if f.dataType.simpleString().startswith("array")
            )
            reps = []
            for i in range(REPLICAS):
                r = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * n))
                if i:
                    r = r.withColumn(
                        dim_col,
                        F.concat(
                            F.slice(F.col(dim_col), i + 1, 10_000),
                            F.slice(F.col(dim_col), 1, i),
                        ),
                    )
                reps.append(r)
            out = reps[0]
            for rr in reps[1:]:
                out = out.unionByName(rr)
        elif t in ("orders", "lineitem", "customer", "supplier", "events"):
            shift_cols = {
                "orders": ["o_orderkey", "o_custkey"],
                "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
                "customer": ["c_custkey"],
                "supplier": ["s_suppkey"],
                "events": ["user_id"],
            }[t]
            maxes = df.agg(
                *[F.max(c).alias(c) for c in shift_cols]
            ).collect()[0]
            reps = []
            for i in range(REPLICAS):
                r = df
                for c in shift_cols:
                    r = r.withColumn(c, F.col(c) + F.lit(i * (maxes[c] + 1)))
                reps.append(r)
            out = reps[0]
            for rr in reps[1:]:
                out = out.unionByName(rr)
        else:  # tiny dims: copy as-is (broadcast side, size-invariant)
            out = df
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    with open(marker, "w") as fh:
        json.dump({"src": SRC, "replicas": REPLICAS}, fh)


def main() -> None:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    names = [a for a in sys.argv[1:] if a.startswith("q")] or DEFAULT_QUERIES
    spark = get_spark("scale_probe")
    build(spark)
    if "--build-only" in sys.argv:
        print(json.dumps({"built": DST}))
        return
    qs = entrymod.queries()
    rows = []
    for name in names:
        fn = qs[name]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()  # codegen warm-up, same as bench.py
        ts = {}
        for sf_dir, label in ((SRC, "t1"), (DST, "t10")):
            best = math.inf
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            ts[label] = round(best, 3)
        alpha = round(math.log(ts["t10"] / ts["t1"]) / math.log(REPLICAS), 3)
        rec = {"query": name, **ts, "exponent": alpha}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": rows}, indent=1))


if __name__ == "__main__":
    main()
