"""Dump the ADAPTIVE FINAL physical plans of every SQL execution a query
runs, from the Spark event log — the r13 plan-evidence tool.

Several operators now materialize eagerly inside the query builder
(localCheckpoint for lineage cuts), so `df.explain()` on the returned
DataFrame shows only the final checkpoint scan. The real execution
evidence is the per-execution `physicalPlanDescription` (including AQE's
final plan after re-optimization), which this script extracts the same
way the SQL tab would show it.

Usage: python scripts/final_plans.py <out_file> <query> [sf_dir]
Writes every execution's final plan (in execution order) to <out_file>.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

EVDIR = "/tmp/spark-events-plans"


def main() -> None:
    out_file, name = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("final_plans")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", EVDIR)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    fn = entrymod.queries()[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.stop()
    import time

    time.sleep(1.0)

    plans: dict[int, str] = {}
    for root, _dirs, fs in os.walk(EVDIR):
        for f in fs:
            if f.endswith(".crc"):
                continue
            with open(os.path.join(root, f)) as fh:
                for line in fh:
                    try:
                        ev = json.loads(line)
                    except ValueError:
                        continue
                    e = ev.get("Event", "")
                    if "SQLExecutionStart" in e or "SQLAdaptiveExecutionUpdate" in e:
                        plans[ev["executionId"]] = ev.get(
                            "physicalPlanDescription", ""
                        )
    with open(out_file, "w") as fh:
        fh.write(
            f"# {name} — adaptive FINAL physical plans per SQL execution"
            f" @ {sf_dir}\n# (event-log physicalPlanDescription; last"
            " update per executionId = AQE final plan)\n"
        )
        for eid in sorted(plans):
            fh.write(f"\n\n===== execution {eid} =====\n")
            fh.write(plans[eid])
    print(f"wrote {out_file} ({len(plans)} executions)")


if __name__ == "__main__":
    main()
