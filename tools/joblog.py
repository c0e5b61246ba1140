"""Per-Spark-job wall-time breakdown for one declared query.

Usage: python tools/joblog.py <query> [sf_dir] [reps]

Enables the Spark event log, runs the query, and prints every job with
its duration, stage names and task counts — the local-mode equivalent
of reading the Jobs tab of the UI (guide §7.1).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    evdir = tempfile.mkdtemp(prefix="tb_evlog_")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from tb_lakehouse_enhanced_spark.session import get_session
    from pyspark.sql import SparkSession
    # event log must be set before session creation
    builder_patch = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
    }
    orig = SparkSession.Builder.getOrCreate

    def patched(self):
        for k, v in builder_patch.items():
            self.config(k, v)
        return orig(self)
    SparkSession.Builder.getOrCreate = patched
    spark = get_session("tb-joblog")
    SparkSession.Builder.getOrCreate = orig
    spark.sparkContext.setLogLevel("ERROR")

    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    fn = SPARK_QUERIES[name]
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"warmup: {time.time() - t0:.3f}s")
    spark.catalog.clearCache()

    marker = time.time() * 1000
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(f"reps: {walls}")
    spark.stop()        # flush the event log

    logf = []
    for root, _d, fns in os.walk(evdir):
        logf += [os.path.join(root, f) for f in fns
                 if "events" in f or f.startswith("local-")]
    logf.sort(key=os.path.getmtime)
    jobs = {}
    stages = {}
    with open(logf[-1]) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description",
                                      props.get("callSite.short", ""))[:90],
                    "stages": [s["Stage ID"]
                               for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"][:60],
                    "tasks": si["Number of Tasks"],
                }
    total = 0.0
    print(f"{'job':>4s} {'sec':>7s} {'gap':>7s} {'tasks':>6s}  desc/stages")
    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["start"] < marker or "end" not in j:
            prev_end = j.get("end", prev_end)
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j["end"]
        total += dur
        ntasks = sum(stages.get(s, {}).get("tasks", 0)
                     for s in j["stages"] if s in stages)
        snames = {stages[s]["name"].split(" at ")[-1]
                  for s in j["stages"] if s in stages}
        print(f"{jid:4d} {dur:7.3f} {gap:7.3f} {ntasks:6d}  "
              f"{j['desc'] or '/'.join(sorted(snames))[:90]}")
    print(f"sum of job durations: {total:.3f}s over {len(walls)} reps "
          f"(wall {sum(walls):.3f}s — rest is driver/gap time)")


if __name__ == "__main__":
    main()
