"""Bucketed-layout scale probe: repeated same-key joins over bucketed
tables vs plain parquet — the evidence for sinks/layout.py::write_bucketed
(pay the shuffle once at write, never at query time).

Synthesizes a fact table (n rows) and a dim table (n/10 rows) sharing a
bigint key, persists both as (a) plain parquet and (b) bucketed+sorted
tables, then times the same join+aggregate run ``reps`` times against
each layout. Broadcast is disabled so the plain-parquet path pays its
real exchange cost (at 100 TB the dim side exceeds any broadcast
threshold anyway — that is the regime bucketing exists for).

Usage:
    python scripts/bucketed_scale_probe.py [n_rows] [reps]  # 5,000,000 3

Prints one JSON line:
    {"probe": "bucketed_scale", "n_rows": N, "write_plain": S,
     "write_bucketed": S, "rows": [{"layout": "plain", "join_secs": [...]},
                                   {"layout": "bucketed", ...}]}
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
from hfsa_spark.sinks.layout import drop_bucketed, write_bucketed


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bucketed_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = spark.range(n).select(
        F.pmod(F.col("id"), n // 10).alias("k"),
        F.pmod(F.hash("id"), 1_000_000).cast("long").alias("amount"),
    )
    dim = spark.range(n // 10).select(
        F.col("id").alias("k"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias("seg"),
    )

    tmp = tempfile.mkdtemp(prefix="bucket_probe_")
    out = {"probe": "bucketed_scale", "n_rows": n, "rows": []}
    try:
        t0 = time.time()
        fact.write.parquet(os.path.join(tmp, "fact_plain"))
        dim.write.parquet(os.path.join(tmp, "dim_plain"))
        out["write_plain"] = round(time.time() - t0, 2)

        t0 = time.time()
        write_bucketed(fact, "probe_fact", os.path.join(tmp, "fact_b"), "k", 32)
        write_bucketed(dim, "probe_dim", os.path.join(tmp, "dim_b"), "k", 32)
        out["write_bucketed"] = round(time.time() - t0, 2)

        def joined(f, d):
            return (
                f.join(d, "k")
                .groupBy("seg")
                .agg(F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n"))
            )

        for layout, (f, d) in [
            (
                "plain",
                (
                    spark.read.parquet(os.path.join(tmp, "fact_plain")),
                    spark.read.parquet(os.path.join(tmp, "dim_plain")),
                ),
            ),
            ("bucketed", (spark.table("probe_fact"), spark.table("probe_dim"))),
        ]:
            secs = []
            for _ in range(reps):
                t0 = time.time()
                joined(f, d).write.format("noop").mode("overwrite").save()
                secs.append(round(time.time() - t0, 2))
            out["rows"].append({"layout": layout, "join_secs": secs})
        print(json.dumps(out))
    finally:
        drop_bucketed(spark, "probe_fact")
        drop_bucketed(spark, "probe_dim")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
