"""Best-of-N timing for a subset of declared queries (bench.py's exact
methodology: noop sink, clearCache between runs, min + median).

Usage: python tools/minibench.py <query> [query ...] [--reps N]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    args = sys.argv[1:]
    reps = 4
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]

    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    from tb_lakehouse_enhanced_spark.session import get_session
    spark = get_session("tb-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    sf_dir = "/root/testdata/sf0.1"
    from tb_lakehouse_enhanced_spark.plans.queries import _t
    from tb_lakehouse_enhanced_spark.sources.registry import TABLES
    for t in TABLES:
        _t(spark, sf_dir, t).count()

    for name in args:
        fn = SPARK_QUERIES[name]
        xs = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            xs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        xs_sorted = sorted(xs)
        med = xs_sorted[len(xs) // 2]
        print(f"{name:28s} min={min(xs):6.3f} med={med:6.3f}  {xs}")


if __name__ == "__main__":
    main()
