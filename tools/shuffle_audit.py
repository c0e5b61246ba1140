"""Shuffle audit: actual exchange volume per query, from plan metrics.

"Minimize shuffles" is this engine's first scale rule; this tool makes
it measurable instead of guessed. For each named query it executes the
plan into the noop sink, then walks the AQE-final executed plan and
reports every Exchange node's real runtime metrics (records + bytes
written to the shuffle, or broadcast build size) — the numbers that
become network traffic on a real cluster.

Usage:
    python tools/shuffle_audit.py <sf_dir> query [query ...]
    python tools/shuffle_audit.py /root/testdata/sf0.1 tpch_q5 fact_upsert

Output per query: one line per exchange with node name and metrics,
plus a total. A query whose total shuffle bytes grow faster than its
input between scale factors is the one to fix first.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def _walk(node, out):
    name = node.nodeName()
    if "Exchange" in name or "Shuffle" in name:
        metrics = node.metrics()
        it = metrics.iterator()
        vals = {}
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        out.append((name, vals))
    # AQE wraps the real tree: AdaptiveSparkPlanExec exposes the final
    # plan via executedPlan(), QueryStageExec wraps its stage via plan()
    # — unwrap each before recursing through ordinary children
    for unwrap in ("executedPlan", "plan"):
        try:
            inner = getattr(node, unwrap)()
            if inner is not None and inner.nodeName() != name:
                _walk(inner, out)
        except Exception:
            pass
    seq = node.children()
    for i in range(seq.size()):
        _walk(seq.apply(i), out)


def audit(spark, sf_dir: str, name: str) -> list[tuple[str, dict]]:
    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    df = SPARK_QUERIES[name](spark, sf_dir)
    # execute through THIS DataFrame's QueryExecution (a .write/.count
    # would build a separate one whose metrics we couldn't read back)
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    plan = qe.executedPlan()
    out: list[tuple[str, dict]] = []
    _walk(plan, out)
    return out


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from tb_lakehouse_enhanced_spark.session import get_session
    spark = get_session("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        rows = audit(spark, sf_dir, name)
        print(f"== {name}")
        shuffle_bytes = broadcast_bytes = 0
        for node, vals in rows:
            # metric keys are INTERNAL camelCase names
            # (shuffleBytesWritten, shuffleRecordsWritten, dataSize...),
            # not the display names the UI shows — match case-insensitively
            interesting = {k: v for k, v in vals.items()
                           if any(s in k.lower() for s in
                                  ("records", "bytes", "size", "rows"))}
            shuffle_bytes += vals.get("shuffleBytesWritten", 0)
            broadcast_bytes += vals.get("dataSize", 0) \
                if "Broadcast" in node else 0
            print(f"   {node}: {interesting}")
        print(f"   TOTAL shuffle bytes written {shuffle_bytes:,}, "
              f"broadcast build bytes {broadcast_bytes:,}")


if __name__ == "__main__":
    main()
