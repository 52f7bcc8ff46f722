"""Manifest-operator scale probe: global total-order window vs the
shard_col (per-group parallel window + broadcast-offset) form of
curriculum_order, token_budget_shards, and order_mixing_audit — the
evidence that the sharded paths added in round 6 actually buy wall time
once the single-task sort matters.

The manifest is synthesized distributed (spark.range): integer scores,
a 64-way source key, and a short text column for the token counter.

Usage:
    python scripts/manifest_scale_probe.py [n_rows]   # default 5,000,000

Prints one JSON line:
    {"probe": "manifest_scale", "n_rows": N,
     "rows": [{"op": "curriculum", "mode": "global", "sec": S}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hfsa_spark import get_spark
from hfsa_spark.operators.packing import token_budget_shards
from hfsa_spark.operators.sampling import curriculum_order, order_mixing_audit


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("manifest_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.hash("id"), 1_000_000)).cast("long").alias("score"),
            F.concat(F.lit("s"), (F.col("id") % 64).cast("string")).alias("src"),
            F.concat(
                F.lit("w0 w1 w2 w3 w"), (F.col("id") % 7).cast("string")
            ).alias("text"),
        )
        .persist()
    )
    df.count()

    def timed(thunk) -> float:
        t0 = time.time()
        thunk.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    rows = []
    for op, make in [
        ("curriculum", lambda sc: curriculum_order(
            df.select("doc_id", "score", "src"), n_bins=10, shard_col=sc)),
        ("token_shards", lambda sc: token_budget_shards(
            df.select("doc_id", "text", "src"), tokens_per_shard=4096,
            shard_col=sc)),
        ("order_audit", lambda sc: order_mixing_audit(
            df.select(F.col("doc_id").alias("pos"), "src",
                      F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1
                                  ).alias("blk")),
            "pos", "src", shard_col=sc)),
    ]:
        for mode, sc in [("global", None),
                         ("sharded", "blk" if op == "order_audit" else "src")]:
            sec = timed(make(sc))
            rows.append({"op": op, "mode": mode, "sec": sec})
            print(f"# {op} {mode}: {sec}s", file=sys.stderr)

    df.unpersist()
    print(json.dumps({"probe": "manifest_scale", "n_rows": n, "rows": rows}))


if __name__ == "__main__":
    main()
