"""Sequence packing: docs -> fixed-length context windows (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.packing import (
    pack_context_windows, plan_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pack_exact_tiny(spark):
    # docs: a=3 toks, b=5, c=4; window=4. Concatenated spans:
    #   a: [0,3)  b: [3,8)  c: [8,12)
    # windows: w0=[0,4) -> a[0,3)+b[0,1); w1=[4,8) -> b[1,5);
    #          w2=[8,12) -> c[0,4)
    df = spark.createDataFrame(
        [("a", 3), ("b", 5), ("c", 4)], "doc string, n int")
    out = {(r.doc, r.window_id, r.tok_from, r.tok_to)
           for r in pack_context_windows(df, "n", 4, ["doc"]).collect()}
    assert out == {("a", 0, 0, 3), ("b", 0, 0, 1), ("b", 1, 1, 5),
                   ("c", 2, 0, 4)}


def test_pack_invariants(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", F.col("n_chars").alias("n")))
    total = docs.agg(F.sum("n")).collect()[0][0]
    w = 1000
    m = pack_context_windows(docs, "n", w, ["doc_id"])
    rows = m.collect()
    # token conservation: every token lands in exactly one window slice
    assert sum(r.n_toks for r in rows) == total
    # each window holds exactly `w` tokens except the last
    per_w = {}
    for r in rows:
        per_w[r.window_id] = per_w.get(r.window_id, 0) + r.n_toks
    last = max(per_w)
    assert all(v == w for k, v in per_w.items() if k != last)
    assert 0 < per_w[last] <= w
    # slices within a doc are contiguous ascending
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for slices in by_doc.values():
        slices.sort(key=lambda r: r.window_id)
        assert slices[0].tok_from == 0
        for a, b in zip(slices, slices[1:]):
            assert a.tok_to == b.tok_from
            assert b.window_id == a.window_id + 1


def test_pack_zero_len_dropped_and_validation(spark):
    df = spark.createDataFrame([("a", 0), ("b", 2)], "doc string, n int")
    out = pack_context_windows(df, "n", 4, ["doc"]).collect()
    assert {r.doc for r in out} == {"b"}
    with pytest.raises(ValueError):
        pack_context_windows(df, "n", 0, ["doc"])


def test_materialize_windows_exact(spark):
    from tb_lakehouse_enhanced_spark.operators.packing import (
        materialize_context_windows,
    )
    toks = spark.createDataFrame(
        [(1, ["a1", "a2", "a3"]), (2, ["b1", "b2", "b3", "b4", "b5"]),
         (3, ["c1", "c2", "c3", "c4"])],
        "doc_id long, toks array<string>")
    d = toks.withColumn("n", F.size("toks").cast("bigint"))
    m = pack_context_windows(d.select("doc_id", "n"), "n", 4, ["doc_id"])
    out = {r.window_id: (r.n_docs, r.n_toks, r.window_text)
           for r in materialize_context_windows(toks, m, "doc_id", "toks")
           .collect()}
    assert out == {0: (2, 4, "a1 a2 a3 b1"),
                   1: (1, 4, "b2 b3 b4 b5"),
                   2: (1, 4, "c1 c2 c3 c4")}


def test_pack_soak_synthetic_50k(spark):
    """Soak the packing prefix-sum on a 50k-doc generated corpus (the
    synthetic DataSource's intended role): invariants must hold at a
    size where range partitioning actually spreads over many tasks."""
    from tb_lakehouse_enhanced_spark.sources.synthetic import register
    register(spark)
    docs = (spark.read.format("synthetic_docs")
            .option("rows", 50_000).option("partitions", 8).load()
            .select("doc_id", F.col("n_chars").alias("n")))
    w = 4096
    m = pack_context_windows(docs, "n", w, ["doc_id"])
    agg = m.agg(F.sum("n_toks").alias("toks"),
                F.countDistinct("window_id").alias("wins")).collect()[0]
    total = docs.agg(F.sum("n")).collect()[0][0]
    assert agg.toks == total
    assert agg.wins == -(-total // w)  # ceil: windows are dense 0..W-1
    # every window full except the last
    per = (m.groupBy("window_id").agg(F.sum("n_toks").alias("t"))
           .orderBy(F.desc("window_id")).limit(5).collect())
    assert all(r.t == w for r in per[1:])


def test_shard_plan_budget_bound(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", F.col("n_chars").alias("n")))
    budget = 20_000
    max_doc = docs.agg(F.max("n")).collect()[0][0]
    a = plan_shards(docs, "n", budget, ["doc_id"])
    per = (a.groupBy("shard_id").agg(F.sum("n_toks").alias("toks"))
           .orderBy("shard_id").collect())
    # every shard is within one max-doc-length of the budget; all but
    # the last reach at least the budget minus one straddling doc
    for r in per[:-1]:
        assert budget - max_doc < r.toks < budget + max_doc
    # docs are never split across shards
    assert a.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_pack_properties_random_lengths(spark):
    """Hypothesis-style randomized invariants over adversarial length
    mixes (window-multiples, ones, zeros, window-1/window+1)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(lens=st.lists(st.sampled_from([0, 1, 3, 4, 7, 8, 9, 16]),
                         min_size=1, max_size=12),
           w=st.sampled_from([4, 8]))
    def run(lens, w):
        rows = [(i, n) for i, n in enumerate(lens)]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        m = pack_context_windows(df, "n", w, ["doc_id"]).collect()
        total = sum(n for _, n in rows if n > 0)
        assert sum(r.n_toks for r in m) == total
        per_w = {}
        for r in m:
            assert 0 <= r.tok_from < r.tok_to
            per_w[r.window_id] = per_w.get(r.window_id, 0) + r.n_toks
        if total:
            # dense window ids 0..ceil(total/w)-1; all full except last
            assert sorted(per_w) == list(range(-(-total // w)))
            last = max(per_w)
            assert all(v == w for k, v in per_w.items() if k != last)
            assert 0 < per_w[last] <= w

    run()
