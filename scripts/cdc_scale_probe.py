"""CDC upsert scale probe: full-outer apply vs broadcast-changes apply
as the base grows and the change batch stays small — the evidence for
operators/cdc.py's 100 TB posture (the base payload should never
shuffle when the batch is broadcastable).

The base is synthesized distributed (spark.range: bigint pk + two
payload columns); the change batch touches ``rate`` of the keys
(updates for 2/3 of them, deletes 1/6, inserts of unseen keys 1/6).

Usage:
    python scripts/cdc_scale_probe.py [n_rows] [rate]   # 5,000,000 0.01

Prints one JSON line:
    {"probe": "cdc_scale", "n_rows": N, "batch_rows": B,
     "rows": [{"mode": "full_outer", "sec": S},
              {"mode": "broadcast", "sec": S}]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hfsa_spark import get_spark
from hfsa_spark.operators.cdc import upsert_merge


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    spark = get_spark("cdc_scale_probe")
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

    mod = max(int(1 / rate), 1)
    touched = base.filter(F.col("k") % mod == 0)
    changes = (
        touched.select(
            "k",
            (F.col("score") + 1).alias("score"),
            F.lit("updated").alias("tag"),
            F.when(F.col("k") % (6 * mod) == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.lit(1).alias("ts"),
        )
        .unionByName(
            touched.filter(F.col("k") % (6 * mod) == mod).select(
                (F.col("k") + n).alias("k"),
                "score",
                F.lit("inserted").alias("tag"),
                F.lit("I").alias("op"),
                F.lit(1).alias("ts"),
            )
        )
        .persist()
    )
    b = changes.count()

    def timed(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    rows = []
    for mode, bc in [("full_outer", False), ("broadcast", True)]:
        sec = timed(
            upsert_merge(base, changes, ["k"], ts_col="ts",
                         broadcast_changes=bc)
        )
        rows.append({"mode": mode, "sec": sec})

    # skewed change batch: ONE hot key carries 10% of the change ROWS
    # (the repeated-update shape a hot entity produces). The exposure is
    # the change-batch window (_latest_per_key partitions by key), not
    # the apply join — the window reduces to one winner per key first,
    # so the join sees no skew. seq breaks the ties deterministically.
    hot_rows = b // 10
    skewed = changes.withColumn("seq", F.lit(0)).unionByName(
        spark.range(hot_rows).select(
            F.lit(0).cast("long").alias("k"),
            F.col("id").alias("score"),
            F.lit("hot").alias("tag"),
            F.lit("U").alias("op"),
            F.lit(1).alias("ts"),
            (F.col("id") + 1).alias("seq"),
        )
    ).persist()
    sb = skewed.count()
    for mode, bc in [("full_outer", False), ("broadcast", True)]:
        sec = timed(
            upsert_merge(base, skewed, ["k"], ts_col="ts", seq_col="seq",
                         broadcast_changes=bc)
        )
        rows.append({"mode": f"skewed_{mode}", "sec": sec,
                     "batch_rows": sb, "hot_key_rows": hot_rows})

    # DEGENERATE skew: ONE key carries essentially the whole batch (the
    # 10^8-updates-of-one-entity storm). The per-key window ships it all
    # into one task's sort (row_number has no partial aggregation);
    # skew_reduce's struct-max semi-reduce collapses each map partition
    # to one candidate per key before the shuffle, so the sort
    # parallelizes and the shuffle carries #partitions rows. Both timed
    # on the same input; agreement is property-tested
    # (tests/test_properties_cdc.py).
    storm_rows = (
        int(sys.argv[3]) if len(sys.argv) > 3 else max(b, 1_000_000)
    )
    storm = spark.range(storm_rows).select(
        F.lit(0).cast("long").alias("k"),
        F.col("id").alias("score"),
        F.lit("storm").alias("tag"),
        F.lit("U").alias("op"),
        F.lit(1).alias("ts"),
        F.col("id").alias("seq"),
    ).persist()
    storm.count()
    for mode, skew in [("window", False), ("semi_reduce", True)]:
        sec = timed(
            upsert_merge(base, storm, ["k"], ts_col="ts", seq_col="seq",
                         broadcast_changes=True, skew_reduce=skew)
        )
        rows.append({"mode": f"degenerate_{mode}", "sec": sec,
                     "batch_rows": storm_rows, "hot_key_rows": storm_rows})

    print(json.dumps({
        "probe": "cdc_scale", "n_rows": n, "batch_rows": b, "rows": rows,
    }))


if __name__ == "__main__":
    main()
