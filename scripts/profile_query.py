"""Per-job/stage profile of one or more gate queries via the Spark event
log (the UI is disabled in this sandbox; the event log carries the same
job/stage timings and shuffle metrics).

Usage: python scripts/profile_query.py q131_pagerank [q155_bm25 ...]

For each query: warm-up at sf0.001, then N timed noop-sink runs at
$SPARK_GRAFT_SF_DIR (default sf0.1); afterwards the event log is parsed
and every job of the LAST timed run is printed with its duration, stage
task counts, shuffle read/write bytes, and the job group description.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

EVDIR = "/tmp/spark-events-profile"


def get_profiling_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hfsa_profile")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", EVDIR)
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def parse_event_log(marker: str) -> None:
    paths = []
    for root, _dirs, fs in os.walk(EVDIR):
        for f in fs:
            if (f.startswith("events_") or f.startswith("local-")) and not f.endswith((".zstd", ".crc", ".lz4")):
                paths.append(os.path.join(root, f))
    paths.sort()
    jobs = {}       # id -> dict
    stages = {}     # id -> dict
    job_of_stage = {}
    lines = []
    for path in paths:
        with open(path) as fh:
            lines.extend(fh)
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description", "")
                jobs[jid] = {"t0": ev["Submission Time"], "desc": desc,
                             "stages": [s["Stage ID"] for s in ev["Stage Infos"]]}
                for s in ev["Stage Infos"]:
                    job_of_stage[s["Stage ID"]] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                stages.setdefault(sid, {}).update({
                    "name": si["Stage Name"].split("\n")[0][:90],
                    "tasks": si["Number of Tasks"],
                    "ms": (t1 - t0) if (t0 and t1) else None,
                })
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {})
                sr = (m.get("Shuffle Read Metrics") or {})
                sw = (m.get("Shuffle Write Metrics") or {})
                st["shuffle_read"] = st.get("shuffle_read", 0) + sr.get(
                    "Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                st["shuffle_write"] = st.get("shuffle_write", 0) + sw.get(
                    "Shuffle Bytes Written", 0)
                st["input"] = st.get("input", 0) + (
                    (m.get("Input Metrics") or {}).get("Bytes Read", 0))
                st["cpu_ms"] = st.get("cpu_ms", 0) + (
                    m.get("Executor CPU Time", 0)) // 1_000_000
                st["run_ms"] = st.get("run_ms", 0) + m.get("Executor Run Time", 0)

    # print only jobs whose description contains the marker
    sel = [(jid, j) for jid, j in sorted(jobs.items()) if marker in j.get("desc", "")]
    total = 0.0
    prev_end = None
    for jid, j in sel:
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        total += dur
        if prev_end is not None and j["t0"] - prev_end > 80:
            print(f"  -- driver gap {(j['t0'] - prev_end)/1000.0:7.3f}s before job {jid}")
        prev_end = j.get("t1", j["t0"])
        print(f"  job {jid:3d} {dur:7.3f}s  {j['desc'][:80]}")
        for sid in sorted(j["stages"]):
            st = stages.get(sid)
            if not st or st.get("ms") is None:
                continue
            print(
                f"    stage {sid:4d} {st['ms']/1000.0:7.3f}s tasks={st.get('tasks', 0):3d} "
                f"in={st.get('input',0)>>20}M sr={st.get('shuffle_read',0)>>20}M "
                f"sw={st.get('shuffle_write',0)>>20}M cpu={st.get('cpu_ms',0)/1000.0:6.1f}s "
                f"run={st.get('run_ms',0)/1000.0:6.1f}s  {st.get('name','')}"
            )
    print(f"  == sum of job walls: {total:.3f}s (driver gaps not included)")


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_profiling_spark()
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        best = float("inf")
        for i in range(2):
            # cache-cold per run (bench.py parity): operators persist
            # intermediates; without clearing, run1 would profile a
            # cache re-read of run0's blocks instead of the engine
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"PROFILE:{name}:run{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(f"\n=== {name}: best wall {best:.3f}s — job/stage breakdown of run1:")
        sys.stdout.flush()
    spark.stop()
    time.sleep(1.0)
    for name in names:
        print(f"\n### {name} run1 jobs:")
        parse_event_log(f"PROFILE:{name}:run1")


if __name__ == "__main__":
    main()
