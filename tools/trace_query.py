"""Method-level wall-time trace for one declared query.

Usage: python tools/trace_query.py <query> [sf_dir] [reps]

Wraps the interesting ManagedTable / mirror methods with wall-clock
accounting (inclusive time, call count) and runs the query into the
noop sink. Nested calls are handled with a stack so each method's
EXCLUSIVE time is reported too.
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

_stack: list[list] = []     # [name, t0, child_time]
_stats = defaultdict(lambda: [0, 0.0, 0.0])   # name -> [n, incl, excl]


def _wrap(cls, name):
    orig = getattr(cls, name)

    def w(*a, **kw):
        label = f"{cls.__name__}.{name}"
        _stack.append([label, time.time(), 0.0])
        try:
            return orig(*a, **kw)
        finally:
            lbl, t0, child = _stack.pop()
            dt = time.time() - t0
            st = _stats[lbl]
            st[0] += 1
            st[1] += dt
            st[2] += dt - child
            if _stack:
                _stack[-1][2] += dt
    setattr(cls, name, w)


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    from tb_lakehouse_enhanced_spark.session import get_session
    from tb_lakehouse_enhanced_spark.sources.managed import ManagedTable
    from tb_lakehouse_enhanced_spark.sources.iceberg import IcebergMirror

    for m in ("overwrite", "append", "upsert_mor", "delete_mor",
              "delete_mor_keys", "update", "delete", "read", "analyze",
              "_publish", "_emit_delta_log", "_emit_iceberg",
              "_stamp_field_ids", "_maintain_skipping_manifests",
              "_maybe_live_checkpoint", "_partial_rewrite",
              "_partial_rewrite_exec", "_carry_mor_minus_touched",
              "_resolve_mor", "_base_scan", "_scan_schema",
              "_write_cdc", "table_changes", "evolve_schema",
              "read_where", "read_where_eq", "_validate",
              "_ensure_readable", "archive_log", "_archived_commits",
              "restore", "_dv_mirror_due", "mirror_deletion_vectors"):
        if hasattr(ManagedTable, m):
            _wrap(ManagedTable, m)
    for m in ("emit", "peek_ids", "_row_counts", "_write_manifest",
              "_fold_manifests", "_metadata_doc", "_write_metadata",
              "_load_state", "_save_state", "_logical_fields"):
        if hasattr(IcebergMirror, m):
            _wrap(IcebergMirror, m)

    spark = get_session("tb-trace")
    spark.sparkContext.setLogLevel("ERROR")
    fn = SPARK_QUERIES[name]
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"warmup: {time.time() - t0:.3f}s")
    spark.catalog.clearCache()
    _stats.clear()

    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
        spark.catalog.clearCache()
    print(f"reps: {[round(w, 3) for w in walls]}  (sum {sum(walls):.3f}s)")
    print(f"{'method':44s} {'n':>4s} {'incl':>8s} {'excl':>8s}")
    for lbl, (n, incl, excl) in sorted(_stats.items(),
                                       key=lambda kv: -kv[1][1]):
        print(f"{lbl:44s} {n:4d} {incl:8.3f} {excl:8.3f}")


if __name__ == "__main__":
    main()
