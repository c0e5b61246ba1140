"""cProfile one declared query's driver side.

Usage: python tools/profile_query.py <query> [sf_dir] [reps]

Runs the query once to warm the JVM, then profiles `reps` executions
into the noop sink and prints the top cumulative-time functions. Spark
job time shows up as py4j socket waits; driver-side work (footer
reads, JSON/Avro emission, os.walk, commit-log parsing) shows as real
Python frames — exactly the split the optimization loop needs.
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    from tb_lakehouse_enhanced_spark.session import get_session
    spark = get_session("tb-profile")
    spark.sparkContext.setLogLevel("ERROR")
    fn = SPARK_QUERIES[name]
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"warmup: {time.time() - t0:.3f}s")
    spark.catalog.clearCache()

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    for _ in range(reps):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    prof.disable()
    print(f"profiled: {reps} reps in {time.time() - t0:.3f}s")
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s)
    st.sort_stats("cumulative").print_stats(60)
    out = s.getvalue()
    # drop the boilerplate header lines
    print(out)


if __name__ == "__main__":
    main()
