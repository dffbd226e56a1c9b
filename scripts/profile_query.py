"""Per-stage profile of one (or more) declared queries.

Runs each named query exactly like bench.py (same session config, same
noop sink, warmup rep then a timed rep) with the Spark event log
enabled, then parses the event log into a per-stage table: wall time,
task time, shuffle read/write bytes, and the first line of the stage
callsite. This is the measure-first tool of the optimization rounds —
it answers "which stage owns the seconds" without the Spark UI (guide
§1/§7: at sf0.1 every frame is small, so wall time is stage/round
overhead; the table makes that visible).

Usage: python scripts/profile_query.py q1 [q2 ...]
       SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... as for bench.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

EVDIR = "/tmp/spark-events-profile"


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("feathr_spark-profile")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name, d):
        qs[name](spark, d).write.format("noop").mode("overwrite").save()

    windows = {}
    for name in names:
        run(name, "/root/testdata/sf0.001")   # warmup (codegen)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.time() * 1000
        w0 = time.perf_counter()
        run(name, sf_dir)
        el = time.perf_counter() - w0
        t1 = time.time() * 1000
        spark.sparkContext.setJobDescription(None)
        windows[name] = (t0, t1, el)
        spark.catalog.clearCache()
    spark.stop()

    ev = sorted(glob.glob(f"{EVDIR}/*"))[-1]
    if os.path.isdir(ev):   # Spark 4 rolling event log directory
        paths = sorted(p for p in glob.glob(f"{ev}/*")
                       if os.path.isfile(p) and "appstatus" not in p)
    else:
        paths = [ev]
    stages = {}      # id -> dict
    jobs = []        # (submit_ms, complete_ms, desc, stage_ids)

    def lines():
        for p in paths:
            with open(p) as f:
                yield from f

    if True:
        for line in lines():
            try:
                e = json.loads(line)
            except Exception:
                continue
            t = e.get("Event")
            if t == "SparkListenerJobStart":
                desc = e.get("Properties", {}).get(
                    "spark.job.description", "")
                jobs.append({"submit": e["Submission Time"], "desc": desc,
                             "stages": [s["Stage ID"]
                                        for s in e["Stage Infos"]],
                             "jid": e["Job ID"]})
            elif t == "SparkListenerJobEnd":
                for j in jobs:
                    if j["jid"] == e["Job ID"]:
                        j["complete"] = e["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                subm = si.get("Submission Time")
                comp = si.get("Completion Time")
                sr = sw = tt = 0
                for acc in si.get("Accumulables", []):
                    n = acc.get("Name", "")
                    if n == "internal.metrics.shuffle.read.remoteBytesRead" \
                       or n == "internal.metrics.shuffle.read.localBytesRead":
                        sr += int(acc.get("Value", 0))
                    elif n == "internal.metrics.shuffle.write.bytesWritten":
                        sw += int(acc.get("Value", 0))
                    elif n == "internal.metrics.executorRunTime":
                        tt = int(acc.get("Value", 0))
                stages[si["Stage ID"]] = {
                    "wall": (comp - subm) if subm and comp else None,
                    "tasks": si.get("Number of Tasks"),
                    "task_ms": tt, "sh_r": sr, "sh_w": sw,
                    "site": si.get("Details", "").split("\n")[0][:120],
                    "name": si.get("Stage Name", "")[:80],
                }

    for name, (t0, t1, el) in windows.items():
        print(f"\n=== {name}: wall {el:.3f}s ===")
        myjobs = [j for j in jobs
                  if j["desc"] == f"PROFILE:{name}" and "complete" in j]
        tot_gap = 0
        prev_end = None
        for j in sorted(myjobs, key=lambda j: j["submit"]):
            jw = j["complete"] - j["submit"]
            gap = (j["submit"] - prev_end) if prev_end else 0
            tot_gap += max(gap, 0)
            prev_end = j["complete"]
            print(f" job {j['jid']:>4} wall {jw/1000:7.3f}s "
                  f"(+gap {max(gap,0)/1000:6.3f}s) stages="
                  f"{len(j['stages'])}")
            for sid in sorted(j["stages"]):
                s = stages.get(sid)
                if not s or s["wall"] is None:
                    continue
                print(f"   stage {sid:>4} wall {s['wall']/1000:7.3f}s "
                      f"tasks {s['tasks']:>3} taskms {s['task_ms']:>7} "
                      f"shR {s['sh_r']:>9} shW {s['sh_w']:>9}  {s['name']}")
        print(f" driver gaps between jobs: {tot_gap/1000:.3f}s "
              f"({len(myjobs)} jobs)")


if __name__ == "__main__":
    main()
