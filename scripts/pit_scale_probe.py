"""Point-in-time-join scale probe: facts ⋈ SCD2 intervals as the fact
table grows — evidence that operators/cdc.py::point_in_time_join stays a
plain hash join with a range residual (never a nested loop) and scales
linearly in facts.

Synthesizes n_keys dimension keys × 3 versions each (ts 10/20/30, the
q202 shape) and ``n_facts`` fact rows with uniform timestamps; times the
left PIT join + a count of matched rows.

Usage:
    python scripts/pit_scale_probe.py [n_facts] [n_keys]  # 5,000,000 100,000

Prints one JSON line:
    {"probe": "pit_scale", "n_facts": N, "n_keys": K,
     "join_strategies": [...], "secs": [run1, run2]}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hfsa_spark import get_spark
from hfsa_spark.operators.cdc import point_in_time_join, scd2_intervals


def main() -> None:
    n_facts = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("pit_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    keys = spark.range(n_keys).select(F.col("id").alias("k"))
    log = None
    for ver, ts in enumerate((10, 20, 30)):
        v = keys.select(
            "k",
            (F.col("k") * 10 + ver).cast("long").alias("state"),
            F.lit("U" if ver else "I").alias("op"),
            F.lit(ts).alias("ts"),
        )
        log = v if log is None else log.unionByName(v)
    intervals = scd2_intervals(log, ["k"], ts_col="ts", op_col="op").persist()
    intervals.count()

    facts = spark.range(n_facts).select(
        F.pmod(F.col("id"), n_keys).alias("k"),
        F.pmod(F.hash("id"), 40).cast("int").alias("ts"),  # 0..39 spans all
    )

    joined = point_in_time_join(facts, intervals, ["k"])
    strategies = sorted(
        set(
            re.findall(
                r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"
                r"|BroadcastNestedLoopJoin|CartesianProduct)",
                joined._jdf.queryExecution().executedPlan().toString(),
            )
        )
    )
    secs = []
    for _ in range(2):
        t0 = time.time()
        joined.write.format("noop").mode("overwrite").save()
        secs.append(round(time.time() - t0, 2))

    print(json.dumps({
        "probe": "pit_scale", "n_facts": n_facts, "n_keys": n_keys,
        "join_strategies": strategies, "secs": secs,
    }))


if __name__ == "__main__":
    main()
