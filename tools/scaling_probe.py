"""Larger-SF scaling probe: 8 vs 32 cores on the heaviest entries.

The r13 verdict's ask #4: at sf0.1 every entry is scheduling/commit
bound, so the 8-core/32-core ratio carries no parallelism signal. This
probe synthesizes a ~10x dataset (sf0.1 unioned with 9 key-shifted
copies; the shift is a multiple of 720720 = lcm of every modulus the
declared queries use, so each copy behaves identically under the
queries' modular filters, and larger than the max key so copies never
collide) laid out as 32 files per table — the multi-split shape a real
table has — and times a subset of entries at 8 and at 32 cores in
separate processes (master is fixed per JVM).

Usage:
    python tools/scaling_probe.py build        # write /tmp data (once)
    python tools/scaling_probe.py run 32       # one timing pass
    python tools/scaling_probe.py run 8
    python tools/scaling_probe.py all          # build + both + summary

Not part of bench.py: the probe publishes its numbers in
SCALING_r14.md / OPTIMIZATION_r14.md alongside BENCH_r14.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

PROBE_DIR = "/tmp/tb_probe_sf1"
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10                      # ~sf1
SHIFT = 720720 * 10              # lcm(3,4,5,7,9,11,13,16,20)=720720; > max key

# heavy lifecycle entries + two pure-plan controls whose scans/joins
# should show ratio ~ core ratio once the input actually splits
ENTRIES = ["evolved_mor_dml", "sql_merge_partitioned",
           "skipping_ingest_read", "fact_projection", "tpch_q3"]
SCALED = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
REPS = 3


def build():
    from pyspark.sql import functions as F

    from tb_lakehouse_enhanced_spark.session import get_session
    spark = get_session("tb-scaling-build", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PROBE_DIR, exist_ok=True)
    for t in ("customer", "documents", "embeddings", "events", "nation",
              "part", "region", "supplier"):
        dst = os.path.join(PROBE_DIR, f"{t}.parquet")
        if not os.path.exists(dst):
            import shutil
            shutil.copy(os.path.join(SRC_DIR, f"{t}.parquet"), dst)
    for t, key in SCALED.items():
        dst = os.path.join(PROBE_DIR, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(SRC_DIR, f"{t}.parquet"))
        out = None
        for i in range(COPIES):
            c = base.withColumn(key, F.col(key) + F.lit(i * SHIFT))
            out = c if out is None else out.unionByName(c)
        (out.repartition(32)
            .write.mode("overwrite").parquet(dst))
        n = spark.read.parquet(dst).count()
        print(f"built {dst}: {n} rows")


def run(cpus: int):
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    import time

    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES, _t
    from tb_lakehouse_enhanced_spark.session import get_session
    from tb_lakehouse_enhanced_spark.sources.registry import TABLES
    spark = get_session(f"tb-scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in TABLES:
        _t(spark, PROBE_DIR, t).count()
    out = {}
    for name in ENTRIES:
        fn = SPARK_QUERIES[name]
        xs = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, PROBE_DIR).write.format("noop") \
                .mode("overwrite").save()
            xs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = min(xs)
        print(f"  {name}: min={min(xs)} xs={xs}", file=sys.stderr)
    print(json.dumps({"cpus": cpus, "entries": out}))


def main():
    mode = sys.argv[1]
    if mode == "build":
        build()
    elif mode == "run":
        run(int(sys.argv[2]))
    elif mode == "all":
        subprocess.run([sys.executable, __file__, "build"], check=True)
        results = {}
        for cpus in (32, 8):
            p = subprocess.run([sys.executable, __file__, "run",
                                str(cpus)],
                               capture_output=True, text=True, check=True)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("{")][-1]
            d = json.loads(line)
            results[d["cpus"]] = d["entries"]
            print(p.stderr, file=sys.stderr)
        summary = {
            name: {"cpus32_sec": results[32][name],
                   "cpus8_sec": results[8][name],
                   "ratio_8_over_32":
                       round(results[8][name]
                             / max(results[32][name], 1e-9), 3)}
            for name in ENTRIES}
        print(json.dumps({"probe_dir": PROBE_DIR, "copies": COPIES,
                          "reps": REPS, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
