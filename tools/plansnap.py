"""Generate PLANS.md: executed physical plans for headline queries.

The scale contract is enforced by tests/test_plans.py; this tool makes
the plans REVIEWABLE — for each selected query it captures the
AQE-final executed plan and a short commentary on why that shape is the
one we want at 100 TB.

Usage: python tools/plansnap.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"

COMMENTARY = {
    "scan_source": "Filters appear as PushedFilters on the parquet scan and "
    "ReadSchema carries only the projected columns — the scan does the "
    "selection, not the executors.",
    "star_agg_sales_by_geo": "Aggregation below the join: partial_sum on the "
    "lineitem side collapses to per-order rows BEFORE the join chain; all "
    "dim joins are BroadcastHashJoin (no SortMergeJoin, no shuffle of the "
    "fact side beyond the one agg exchange).",
    "tpch_q6": "The whole query is scan -> filter -> partial agg -> single "
    "exchange -> final agg, entirely inside WholeStageCodegen; every "
    "predicate reached PushedFilters.",
    "scd2_merge_state": "ONE shuffle join per merge (the full-outer on the "
    "natural key) with CASE-fused branch projections — no per-branch "
    "re-execution of the join subtree.",
    "dedup_minhash": "Signature build inherits a single hash partitioning "
    "on doc id; band buckets shuffle once; the first-matching-band filter "
    "dedups candidate pairs with data already on the row (no extra "
    "exchange).",
    "simsearch_topk": "The query set broadcasts; the corpus never "
    "shuffles — per-partition local top-k then a tiny merge.",
    "incremental_agg": "The change feed aggregates to per-group signed "
    "deltas (|changes| rows) and full-outer-joins the materialized state "
    "on the group key — no scan of the base table anywhere in the plan.",
    "fuzzy_match": "Candidate generation is an equi-join on the blocking "
    "key (BroadcastHashJoin here, shuffle join at scale) — no "
    "CartesianProduct / BroadcastNestedLoopJoin; the argmin window is "
    "partitioned by dirty key.",
    "stream_session": "Native session_window aggregation: one hash "
    "exchange on (session-window, user), merging-session state inside "
    "the aggregate — the exact plan that runs under readStream + "
    "watermark, batch-checked here.",
    "asof_join_forward": "Union-sort as-of: both sides union into ONE "
    "exchange on the key, a single per-key sort, and the "
    "first-following window binds each click to its next purchase — no "
    "range join, no per-row rescans.",
    "corpus_pipeline": "The full corpus-prep composition stays one lazy "
    "plan: quality filters reach the documents scan, clustering joins "
    "shuffle on ids/buckets only, and the survivor argmax is a "
    "map-side-combinable aggregate — no materialization between stages.",
    "search_bm25": "Per-term tf is an ArrayFilter+Size expression inside "
    "WholeStageCodegen on the scan (no explode, no UDF); the corpus "
    "stats are ONE partial+final scalar aggregate broadcast back via "
    "BroadcastNestedLoopJoin (1 row — the only place BNLJ is the right "
    "join); the top-k is TakeOrderedAndProject, a per-partition heap.",
    "time_weighted_avg": "The lead window and the grouped aggregation "
    "share the SAME hashpartitioning(user_id) — one Exchange in the "
    "whole plan; all arithmetic is exact long/decimal inside codegen.",
    "assoc_lift": "Pairs come from an IN-ROW 2-combination explode of "
    "the per-key sorted basket array (higher-order transform/slice in "
    "codegen) — no basket self-join anywhere in the plan; the per-item "
    "counts broadcast back onto the tiny pair relation.",
    "pack_context": "Sequence packing rides the distributed prefix-sum: "
    "ONE RangePartitioning exchange orders the docs, per-partition "
    "ordinals come from monotonically_increasing_id on locally-sorted "
    "partitions, the P-row offset relation broadcasts back, and the "
    "window fan-out is a narrow sequence+explode — no data-sized "
    "single-task Window anywhere.",
    "dedup_embedding": "LSH-bucketed near-dup (round-4 default): one "
    "Arrow pass computes per-rotation sign buckets, ONE hash exchange "
    "on (rot, bucket) feeds FlatMapGroupsInPandas, and each bucket's "
    "pairs come from an in-task matmul with first-colliding-rotation "
    "dedupe — no corpus broadcast, no driver collect, no cross join, "
    "no distinct exchange over the pair set.",
    "interval_overlap": "Interval-interval overlap as a bucket "
    "equi-join: both sides explode to shared-width buckets, the join "
    "condition carries the exact overlap residual AND the "
    "first-shared-bucket dedupe — no CartesianProduct, no "
    "BroadcastNestedLoopJoin, no distinct exchange; exactly-once "
    "pairs straight out of the join.",
    "search_hybrid": "Both retrieval branches end bounded: BM25's "
    "TakeOrderedAndProject top-depth and the cosine partial-top-k "
    "merge; the RRF fusion joins <= 2*depth rows and the final "
    "row_number window ranks that tiny relation — corpus scanned once "
    "per branch, nothing wide shuffles.",
    "merge_mor": "Merge-on-read upsert read path: base + delta files "
    "union under ONE hash exchange on the key for the "
    "last-writer-wins window — the documented MOR read amplification; "
    "the WRITE that produced it appended one delta file and rewrote "
    "nothing.",
    "edit_distance_join":
    "Lossless segment-blocked edit-distance join: both sides explode "
    "to (length, slot, segment text) rows and candidates meet in a "
    "hash equi-join ON THE SEGMENT KEY (BroadcastHashJoin at this "
    "size, shuffle join at scale), then the exact levenshtein "
    "residual filters candidate pairs — the main path is never a "
    "cross product. The one BroadcastNestedLoopJoin below it is the "
    "deliberate short-string branch: strings shorter than d+1 chars "
    "(where the pigeonhole proof cannot apply) pair directly against "
    "the equally tiny <=2d-char right set.",
    "search_bm25_indexed":
    "BM25 serving probe against the persisted posting index: the scan "
    "carries the term_bucket predicate as a PartitionFilter (only the "
    "probe terms' bucket dirs are read), per-term df is a tiny "
    "broadcast-joined aggregate over the SAME pruned scan (nothing "
    "stored to go stale on appends), per-posting contributions "
    "quantize to integers BEFORE the per-doc hash aggregate (order-"
    "independent sum), and the top-k is a TakeOrdered over the "
    "aggregated docs — index build cost is excluded here (one-time), "
    "the probe is the serving-path shape.",
    "iceberg_external_read":
    "Table reconstructed from the Iceberg v2 metadata alone through a "
    "mid-MOR state: parquet scans group per physical generation, "
    "per-file sequence numbers and identity-partition values attach "
    "via ONE BroadcastHashJoin on the file path (never a per-file "
    "CASE chain — plan size is O(1) in file count), and the equality "
    "deletes apply as a broadcast left-outer + sequence filter. "
    "Nothing data-sized shuffles before the final small aggregate.",
    "log_retention_read":
    "Change feed over a range crossing the archived commit segment: "
    "every batch's insert files fold into ONE multi-path scan with "
    "_commit_version parsed from the path — scan-node count is "
    "independent of how many commits the range spans, and the "
    "archive fold changed only where commit METADATA lives, not the "
    "plan.",
}


def main():
    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    from tb_lakehouse_enhanced_spark.session import get_session

    spark = get_session("plansnap")
    out = ["# PLANS — executed physical plans (AQE-final) at sf0.001",
           "",
           "Generated by `python tools/plansnap.py`. The shapes below are "
           "asserted by `tests/test_plans.py`; this file exists so a "
           "reviewer can see them without running Spark. Local runs show "
           "BroadcastHashJoin for the growing dims (runtime sizes under "
           "the threshold); at cluster scale AQE degrades exactly those "
           "to shuffle joins — the hinted constant dims stay broadcast.",
           ""]
    for name, note in COMMENTARY.items():
        df = SPARK_QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip AQE noise + plan ids for readability
        plan = re.sub(r"#\d+L?", "", plan)
        plan = re.sub(r"\[plan_id=\d+\]", "", plan)
        plan = re.sub(r"file:[^,\]\s]+", "<path>", plan)
        lines = [ln.rstrip() for ln in plan.splitlines()]
        if len(lines) > 40:
            lines = lines[:40] + [f"... ({len(lines) - 40} more lines)"]
        out += [f"## {name}", "", note, "", "```", *lines, "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(COMMENTARY)} plans)")


if __name__ == "__main__":
    main()
