"""Calendar, dedup, similarity, text ops — semantic spot checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.functions.text import (
    doc_fingerprint, lang_id, token_count,
)
from tb_lakehouse_enhanced_spark.operators.calendar import calendar_spine, date_key
from tb_lakehouse_enhanced_spark.operators.dedup import (
    exact_dedup, jaccard_near_dup, minhash_lsh_pairs, simhash_pairs,
)
from tb_lakehouse_enhanced_spark.operators.similarity import cosine_topk


def test_calendar_known_date(spark):
    row = (calendar_spine(spark, "2000-01-01", "2000-12-31")
           .filter(F.col("cal_date") == "2000-02-29").collect())
    assert len(row) == 1
    r = row[0]
    assert r["date_key"] == 20000229
    assert r["day_name"] == "Tuesday" and r["month_name"] == "February"
    assert r["iso_day_of_week"] == 2 and not r["is_weekend"]
    assert str(r["month_end"]) == "2000-02-29"


def test_smart_date_key(spark):
    got = spark.range(1).select(
        date_key(F.to_date(F.lit("2024-07-05"))).alias("k")).collect()[0]["k"]
    assert got == 20240705


DOCS = [
    (1, "the cat sat on the mat and looked at the dog", "en"),
    (2, "the cat sat on the mat and looked at the dog", "en"),     # exact dup
    (3, "the cat sat on the mat and stared at the dog", "en"),     # near dup
    (4, "der hund ist gross und die katze ist klein heute ja", "de"),
    (5, "completely different words about spark query engines here", "en"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_exact_dedup_keeps_min_id(docs):
    out = {r["doc_id"] for r in exact_dedup(docs).collect()}
    assert out == {1, 3, 4, 5}  # doc 2 deduped into doc 1


def test_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in jaccard_near_dup(docs, threshold=0.6).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.6 <= pairs[(1, 3)] < 1.0


def test_minhash_lsh_finds_exact_dup(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert (1, 5) not in pairs and (4, 5) not in pairs


def test_simhash_identical_docs_distance_zero(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0


def test_cosine_topk_planted_neighbor(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    base = rng.random(8).astype("float32")
    rows = [(0, [float(x) for x in base])]
    rows += [(i, [float(x) for x in rng.random(8)]) for i in range(1, 20)]
    rows.append((99, [float(x * 2.0) for x in base]))  # same direction as 0
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_topk(emb, emb.filter("vec_id = 0"), k=3)
    top1 = out.filter("rank = 1").collect()[0]
    assert top1["query_id"] == 0 and top1["neighbor_id"] == 99


def test_lang_id_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "the house and the tree is big"),
         (2, "der mann und die frau ist hier"),
         (3, "xyzzy plugh")], ["id", "t"])
    got = {r["id"]: r["l"] for r in
           df.select("id", lang_id(F.col("t")).alias("l")).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}

    fp = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world ")], ["id", "t"])
    fps = [r["f"] for r in fp.select(doc_fingerprint(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[1]  # normalization collapses case + whitespace


def test_token_count_bpe_ish(spark):
    df = spark.createDataFrame([(1, "hello world, 42!")], ["id", "t"])
    n = df.select(token_count(F.col("t")).alias("n")).collect()[0]["n"]
    # hello, world, ',', '4', '2', '!'
    assert n == 6


def test_ivf_topk_recall_vs_exact(spark):
    from tb_lakehouse_enhanced_spark.operators.similarity import ivf_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_topk(emb, queries, k=5, n_probe=8).collect()}
    # probing half the lists should recover most exact neighbors
    assert len(exact & approx) / len(exact) >= 0.5
    # deterministic across runs
    again = {(r["query_id"], r["neighbor_id"])
             for r in ivf_topk(emb, queries, k=5, n_probe=8).collect()}
    assert approx == again


def test_embedding_near_dup_lsh_recall_and_subset(spark):
    """LSH-bucketed near-dup (the default dedup_embedding path):
    every emitted pair is a TRUE pair (exact-cosine verify => no false
    positives vs the all-pairs ground truth), and recall on planted
    high-cos duplicates is near-total (the regime near-dup targets;
    the docstring's banding curve)."""
    import numpy as np
    from tb_lakehouse_enhanced_spark.operators.similarity import (
        embedding_near_dup, embedding_near_dup_lsh,
    )
    rng = np.random.default_rng(7)
    base = rng.normal(size=(150, 64))
    noise = rng.normal(size=(150, 64)) * 0.23      # copy at cos ~0.9
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, [float(x) for x in v]))
        rows.append((i * 2 + 1, [float(x) for x in (v + noise[i])]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = {(r.id_a, r.id_b)
             for r in embedding_near_dup(df, threshold=0.8).collect()}
    got = {(r.id_a, r.id_b)
           for r in embedding_near_dup_lsh(df, threshold=0.8).collect()}
    assert got <= truth                      # exact verify: no extras
    assert len(got & truth) / len(truth) >= 0.95
    # deterministic across runs (fixed LCG planes)
    again = {(r.id_a, r.id_b)
             for r in embedding_near_dup_lsh(df, threshold=0.8).collect()}
    assert got == again


def test_salted_join_matches_plain_join(spark):
    """Salted join is result-identical to the direct equi-join."""
    from tb_lakehouse_enhanced_spark.operators.skew import salted_join
    from tb_lakehouse_enhanced_spark.plans.queries import _t

    sf = "/root/testdata/sf0.001"
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate")
    plain = li.join(o, "l_orderkey").groupBy("l_orderkey").count()
    salted = salted_join(li, o, "l_orderkey", n_salts=8) \
        .groupBy("l_orderkey").count()
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_repetition_stats_values(spark, tmp_path):
    """Hand-checked repetition metrics on a crafted doc."""
    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    docs = spark.createDataFrame(
        [(1, "a a a b"),      # 4 words, 2 distinct, top=3/4, 2grams: aa,aa,ab -> dup 1/3
         (2, "x")],           # single word
        ["doc_id", "text"])
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    for t in ("region nation customer supplier part orders lineitem events "
              "embeddings").split():
        # repetition_stats only reads documents; point the rest anywhere
        pass
    out = {r["doc_id"]: r for r in
           SPARK_QUERIES["repetition_stats"](spark, str(tmp_path)).collect()}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert abs(r1["distinct_word_ratio"] - 0.5) < 1e-12
    assert abs(r1["top_word_frac"] - 0.75) < 1e-12
    assert abs(r1["dup_2gram_frac"] - (1 - 2 / 3)) < 1e-12
    assert abs(r1["mean_word_len"] - 1.0) < 1e-12
    r2 = out[2]
    assert r2["n_words"] == 1 and r2["dup_2gram_frac"] == 0.0


def test_sampling_deterministic_under_repartition(spark):
    """The keep/repeat decision must be a pure function of the row key:
    re-partitioned input yields the identical sample (the property
    DataFrame.sample lacks)."""
    from tb_lakehouse_enhanced_spark.operators.sampling import (
        mix_sources, sample_stratified)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "lang", "source")
    a = sample_stratified(docs, {"en": 0.5}, "lang", "doc_id",
                          default_rate=0.2)
    b = sample_stratified(docs.repartition(7), {"en": 0.5}, "lang",
                          "doc_id", default_rate=0.2)
    assert sorted(r.doc_id for r in a.collect()) \
        == sorted(r.doc_id for r in b.collect())

    m = mix_sources(docs, {"src0": 2.4, "src1": 0.0}, "source", "doc_id")
    rows = m.collect()
    # every src0 row appears at least twice (integer part of 2.4)
    per_key = {}
    for r in rows:
        per_key.setdefault(r.doc_id, []).append(r.epoch)
    assert all(sorted(v) == list(range(len(v))) and len(v) >= 2
               for v in per_key.values())
    assert not [r for r in rows if r.source == "src1"]


def test_dedup_tier_tolerates_nulls_and_empty(spark):
    """Null/empty text documents must not crash any dedup tier (real
    corpora contain them); they simply produce no shingles/words and
    fall out of candidate generation."""
    from pyspark.sql import Row
    from tb_lakehouse_enhanced_spark.operators.dedup import (
        exact_dedup, incremental_dedup, minhash_lsh_pairs, simhash_pairs)

    docs = spark.createDataFrame([
        Row(doc_id=1, text=None), Row(doc_id=2, text=""),
        Row(doc_id=3, text="   "), Row(doc_id=4, text="one two three four"),
        Row(doc_id=5, text="one two three four"),
    ])
    assert minhash_lsh_pairs(docs, threshold=0.5).count() == 1  # 4~5 only
    assert {(r.id_a, r.id_b) for r in simhash_pairs(docs).collect()} \
        >= {(4, 5)}
    surv = exact_dedup(docs)
    assert surv.filter(F.col("text").isNotNull()).count() == 3  # "", "   ", text
    inc = incremental_dedup(docs.filter(F.col("doc_id") >= 4),
                            docs.filter(F.col("doc_id") < 4))
    assert inc.count() == 2  # batch 4,5 not in corpus 1-3


def test_winnow_guarantee_shared_substring(spark):
    from tb_lakehouse_enhanced_spark.operators.dedup import (
        winnow_fingerprints, winnow_pairs)
    # docs 1 and 2 share a substring of length >= w + k - 1 = 19 chars;
    # doc 3 shares nothing that long -> winnowing THEOREM: 1-2 must
    # share a fingerprint, 1-3/2-3 need not
    shared = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [(1, f"aaa {shared} bbb ccc ddd eee"),
         (2, f"xxx yyy {shared} zzz www vvv"),
         (3, "completely different content with no common run here")],
        "doc_id long, text string")
    fps = winnow_fingerprints(docs, k=12, w=8)
    by_doc = {r["id"]: set() for r in fps.collect()}
    for r in fps.collect():
        by_doc[r["id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2]          # guaranteed shared fingerprint
    pairs = {(r["id_a"], r["id_b"]) for r in
             winnow_pairs(docs, k=12, w=8, max_df=10, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_guarantee_property(spark):
    """Winnowing theorem, property-based: ANY pair of documents sharing
    a substring of length >= w + k - 1 shares a selected fingerprint."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from tb_lakehouse_enhanced_spark.operators.dedup import winnow_fingerprints

    K, W = 6, 4
    alpha = st.text(alphabet="abcd ", min_size=0, max_size=20)
    shared = st.text(alphabet="wxyz", min_size=K + W - 1, max_size=K + W + 6)

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(pre1=alpha, post1=alpha, pre2=alpha, post2=alpha, run=shared)
    def check(pre1, post1, pre2, post2, run):
        docs = spark.createDataFrame(
            [(1, f"{pre1}{run}{post1}"), (2, f"{pre2}{run}{post2}")],
            "doc_id long, text string")
        fps = winnow_fingerprints(docs, k=K, w=W)
        by_doc = {1: set(), 2: set()}
        for r in fps.collect():
            by_doc[r["id"]].add(r["fp"])
        assert by_doc[1] & by_doc[2]

    check()


def test_pq_topk_recall_vs_exact(spark):
    from tb_lakehouse_enhanced_spark.operators.similarity import pq_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in pq_topk(emb, queries, k=5).collect()}
    # ADC + exact re-rank should recover most exact neighbors
    assert len(exact & approx) / len(exact) >= 0.6
    again = {(r["query_id"], r["neighbor_id"])
             for r in pq_topk(emb, queries, k=5).collect()}
    assert approx == again  # deterministic codebooks + rerank


def test_dense_sequence_rank_invariant_to_width(spark):
    """Regression: the offsets aggregate and the final join must observe
    the SAME range assignment (they diverged at narrow widths before the
    ranged relation was checkpointed) — ranks must equal ROW_NUMBER for
    every partition count."""
    from tb_lakehouse_enhanced_spark.operators.sequence import dense_sequence
    df = (spark.range(0, 3000).selectExpr("id * 7 % 2999 AS k").distinct())
    expect = {r["k"]: i + 1 for i, r in
              enumerate(df.orderBy("k").collect())}
    for n in (None, 8, 4, 1):
        got = {r["k"]: r["_id"] for r in
               dense_sequence(df, ["k"], "_id", num_partitions=n).collect()}
        assert got == expect, f"width {n}"


def test_leakage_safe_split_never_straddles_near_dup_pairs(spark):
    """The guarantee split_leakage_safe exists for: every near-dup pair
    lands entirely inside one split, because the split is hashed on the
    pair's shared cluster id."""
    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    from tb_lakehouse_enhanced_spark.operators.dedup import minhash_lsh_pairs
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    splits = SPARK_QUERIES["split_leakage_safe"](spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, threshold=0.5, base_hash="md5")
    a = splits.selectExpr("doc_id AS id_a", "split AS split_a")
    b = splits.selectExpr("doc_id AS id_b", "split AS split_b")
    straddling = (pairs.join(a, "id_a").join(b, "id_b")
                  .filter(F.col("split_a") != F.col("split_b")))
    assert straddling.count() == 0
    # sanity: the pair graph is non-trivial and more than one split exists
    assert pairs.count() > 0
    assert splits.select("split").distinct().count() >= 2


def test_asof_join_directions(spark):
    """backward / forward / nearest as-of semantics on a known fixture."""
    from tb_lakehouse_enhanced_spark.operators.asof import asof_join

    mk = lambda rows, cols: (spark.createDataFrame(rows, cols)
                             .selectExpr(f"CAST({cols[0]} AS TIMESTAMP) ts",
                                         *cols[1:]))
    left = mk([("2024-01-01 10:00:00", 1, "L1"),
               ("2024-01-01 12:00:00", 1, "L2"),
               ("2024-01-01 09:00:00", 2, "L3")], ["s", "k", "tag"])
    right = mk([("2024-01-01 09:30:00", 1, 100.0),   # before L1/L2
                ("2024-01-01 11:00:00", 1, 200.0),   # between L1 and L2
                ("2024-01-01 10:00:00", 2, 300.0)],  # after L3
               ["s", "k", "v"])

    def got(direction):
        out = asof_join(left, right, key="k", payload=("v",),
                        prefix="m_", direction=direction)
        return {r["tag"]: r["m_v"] for r in out.collect()}

    # backward: latest right <= left.ts
    assert got("backward") == {"L1": 100.0, "L2": 200.0, "L3": None}
    # forward: earliest right >= left.ts
    assert got("forward") == {"L1": 200.0, "L2": None, "L3": 300.0}
    # nearest: L1 is 30min from 100.0 and 60min from 200.0 -> 100.0;
    # L2 is 60min from 200.0 (backward only); L3 only has a forward match
    assert got("nearest") == {"L1": 100.0, "L2": 200.0, "L3": 300.0}

    # equal-timestamp tie: inclusive on both directions, nearest -> backward
    r_eq = mk([("2024-01-01 10:00:00", 1, 42.0)], ["s", "k", "v"])
    for d, want in (("backward", 42.0), ("forward", 42.0), ("nearest", 42.0)):
        out = asof_join(left.filter("tag = 'L1'"), r_eq, key="k",
                        payload=("v",), prefix="m_", direction=d)
        assert out.collect()[0]["m_v"] == want, d


def test_asof_join_null_payload_comes_from_matched_row(spark):
    """ASOF semantics: the matched row's NULL payload stays NULL — the
    join must not skip back to an older non-null value (all payload
    columns bind atomically to one matched row)."""
    from tb_lakehouse_enhanced_spark.operators.asof import asof_join

    mk = lambda rows, cols: (spark.createDataFrame(rows, cols)
                             .selectExpr(f"CAST({cols[0]} AS TIMESTAMP) ts",
                                         *cols[1:]))
    left = mk([("2024-01-01 10:00:00", 1, "L1")], ["s", "k", "tag"])
    right = (spark.createDataFrame(
        [("2024-01-01 08:00:00", 1, 5.0, "old"),
         ("2024-01-01 09:00:00", 1, None, "new")],
        "s string, k long, v double, label string")
        .selectExpr("CAST(s AS TIMESTAMP) ts", "k", "v", "label"))
    [row] = asof_join(left, right, key="k", payload=("v", "label"),
                      prefix="m_").collect()
    # the matched row is the 09:00 one: its v is NULL and must stay NULL
    assert row["m_label"] == "new"
    assert row["m_v"] is None


def test_sentence_udtf_matches_builtin_path(spark):
    """The UDTF extension point and the preferred built-in
    split+posexplode path implement the same row-expansion contract."""
    from tb_lakehouse_enhanced_spark.operators.chunking import (
        register_sentence_udtf, sentence_split_builtin,
    )

    register_sentence_udtf(spark)
    docs = spark.createDataFrame(
        [(1, "Hello there. Bye now."), (2, "One."), (3, "  "), (4, None)],
        "doc_id long, text string")
    docs.createOrReplaceTempView("_udtf_docs")
    via_udtf = {(r["doc_id"], r["sent_no"], r["sentence"]) for r in spark.sql(
        "SELECT d.doc_id, s.* FROM _udtf_docs d, "
        "LATERAL split_sentences(d.text) s").collect()}
    via_builtin = {(r["doc_id"], r["sent_no"], r["sentence"])
                   for r in sentence_split_builtin(docs).collect()}
    assert via_udtf == via_builtin == {
        (1, 0, "Hello there"), (1, 1, "Bye now"), (2, 0, "One")}


def test_asof_join_randomized_against_bruteforce(spark):
    """All three as-of directions checked against a per-row brute-force
    reference on a seeded random fixture (many keys, duplicate
    timestamps, sparse right side)."""
    import random

    from tb_lakehouse_enhanced_spark.operators.asof import asof_join

    rng = random.Random(42)
    left_rows = [(k, t, i) for i, (k, t) in enumerate(
        (rng.randint(1, 5), rng.randint(0, 30)) for _ in range(80))]
    right_rows = [(k, t, float(v)) for k, t, v in
                  ((rng.randint(1, 5), rng.randint(0, 30), rng.randint(1, 99))
                   for _ in range(40))]
    # dedupe right on (k, ts): equal-ts duplicates make the matched row
    # ambiguous in ANY asof implementation (engine picks one arbitrarily)
    seen = set()
    right_rows = [r for r in right_rows
                  if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]

    left = spark.createDataFrame(left_rows, "k long, ts long, rowid long")
    right = spark.createDataFrame(right_rows, "k long, ts long, v double")

    def brute(direction):
        out = {}
        for k, t, rid in left_rows:
            cands = [(rt, v) for rk, rt, v in right_rows if rk == k]
            back = max((c for c in cands if c[0] <= t), default=None)
            fwd = min((c for c in cands if c[0] >= t), default=None)
            if direction == "backward":
                pick = back
            elif direction == "forward":
                pick = fwd
            else:
                if back is None:
                    pick = fwd
                elif fwd is None:
                    pick = back
                else:
                    pick = fwd if (fwd[0] - t) < (t - back[0]) else back
            out[rid] = pick[1] if pick else None
        return out

    for direction in ("backward", "forward", "nearest"):
        got = {r["rowid"]: r["m_v"] for r in
               asof_join(left, right, key="k", payload=("v",), prefix="m_",
                         direction=direction).collect()}
        assert got == brute(direction), direction


def test_bm25_topk_ranking(spark):
    from tb_lakehouse_enhanced_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark spark spark engine"),          # tf=3, short
         (2, "spark engine for big data"),         # tf=1, short
         (3, "engine only no probe term here"),    # no hit -> excluded
         (4, "spark " + "filler " * 40)],          # tf=1 but long -> below d2
        "doc_id long, text string")
    got = {r["doc_id"]: r["rank"]
           for r in bm25_topk(docs, ["spark"], k=10).collect()}
    assert got == {1: 1, 2: 2, 4: 3}

    # multi-term: matching both probe terms beats matching one at equal tf/dl
    docs2 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha alpha gamma delta"),
         (3, "gamma delta zeta eta")],
        "doc_id long, text string")
    got2 = {r["doc_id"]: r["rank"]
            for r in bm25_topk(docs2, ["alpha", "beta"], k=10).collect()}
    assert got2[1] == 1 and 3 not in got2


def test_flatten_hierarchy_chain_and_forest(spark):
    from tb_lakehouse_enhanced_spark.operators.hierarchy import (
        flatten_hierarchy, subtree_rollup,
    )

    # two roots: a 12-deep chain under 0, a star under 100
    rows = [(0, None), (100, None)]
    rows += [(i, i - 1) for i in range(1, 13)]          # chain 0<-1<-...<-12
    rows += [(100 + i, 100) for i in range(1, 4)]       # star leaves
    nodes = spark.createDataFrame(rows, "id long, parent_id long")

    # exercise BOTH the driver fast path (default) and the distributed
    # pointer-doubling loop (local_threshold=0)
    got = {r["id"]: (r["root_id"], r["depth"])
           for r in flatten_hierarchy(nodes).collect()}
    got_dist = {r["id"]: (r["root_id"], r["depth"])
                for r in flatten_hierarchy(nodes, local_threshold=0).collect()}
    assert got == got_dist
    assert got[0] == (0, 0) and got[12] == (0, 12) and got[5] == (0, 5)
    assert got[100] == (100, 0) and got[103] == (100, 1)
    assert len(got) == len(rows)

    roll = {r["root_id"]: (r["n_nodes"], r["max_depth"]) for r in
            subtree_rollup(nodes.withColumn("w", F.lit(1)), {"s": "w"})
            .collect()}
    assert roll[0] == (13, 12) and roll[100] == (4, 1)


def test_flatten_hierarchy_cycle_raises(spark):
    from tb_lakehouse_enhanced_spark.operators.hierarchy import flatten_hierarchy

    cyc = spark.createDataFrame(
        [(1, 2), (2, 1), (3, None)], "id long, parent_id long")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="cycle"):
        flatten_hierarchy(cyc, max_iterations=5)
    with _pytest.raises(ValueError, match="cycle"):
        flatten_hierarchy(cyc, max_iterations=5, local_threshold=0)


def test_ancestor_closure_chain(spark):
    from tb_lakehouse_enhanced_spark.operators.hierarchy import (
        ancestor_closure, subtree_rollup_per_node,
    )

    # chain 0<-1<-2<-3 plus a side leaf 10 under 1
    nodes = spark.createDataFrame(
        [(0, None), (1, 0), (2, 1), (3, 2), (10, 1)],
        "id long, parent_id long")
    pairs = {(r["id"], r["anc"]): r["dist"]
             for r in ancestor_closure(nodes).collect()}
    assert pairs[(3, 2)] == 1 and pairs[(3, 1)] == 2 and pairs[(3, 0)] == 3
    assert pairs[(10, 1)] == 1 and pairs[(10, 0)] == 2
    assert len(pairs) == 1 + 2 + 3 + 2  # sum of node depths

    roll = {r["node_id"]: (r["n_desc"], r["max_depth"]) for r in
            subtree_rollup_per_node(nodes.withColumn("w", F.lit(1)),
                                    {"s": "w"}).collect()}
    assert roll[0] == (5, 3)      # whole tree
    assert roll[1] == (4, 2)      # 1,2,3,10
    assert roll[3] == (1, 0)      # leaf


def test_hierarchy_randomized_vs_reference(spark):
    """Random forests: both flatten paths and the closure agree with a
    driver-side reference implementation."""
    import random

    from tb_lakehouse_enhanced_spark.operators.hierarchy import (
        ancestor_closure, flatten_hierarchy,
    )

    rng = random.Random(42)
    n = 120
    rows = []
    for i in range(n):
        parent = None if (i < 5 or rng.random() < 0.08) else rng.randrange(i)
        rows.append((i, parent))
    nodes = spark.createDataFrame(rows, "id long, parent_id long")
    parent = dict(rows)

    def ref_flat(i):
        d = 0
        while parent[i] is not None:
            i, d = parent[i], d + 1
        return i, d

    expect = {i: ref_flat(i) for i, _ in rows}
    for kw in ({}, {"local_threshold": 0}):
        got = {r["id"]: (r["root_id"], r["depth"])
               for r in flatten_hierarchy(nodes, **kw).collect()}
        assert got == expect, kw

    expect_pairs = {}
    for i, _ in rows:
        j, d = i, 0
        while parent[j] is not None:
            j, d = parent[j], d + 1
            expect_pairs[(i, j)] = d
    got_pairs = {(r["id"], r["anc"]): r["dist"]
                 for r in ancestor_closure(nodes).collect()}
    assert got_pairs == expect_pairs


def test_flatten_hierarchy_deep_chain_distributed(spark):
    """Depth-3000 chain through the DISTRIBUTED pointer-doubling path:
    must resolve in ~log2(depth) rounds (iteration cap 15 would fail a
    linear walk at 3000), with exact depths at the bottom."""
    from tb_lakehouse_enhanced_spark.operators.hierarchy import flatten_hierarchy

    n = 3000
    nodes = spark.range(n).selectExpr(
        "id", "CASE WHEN id = 0 THEN NULL ELSE id - 1 END AS parent_id")
    flat = flatten_hierarchy(nodes, local_threshold=0, max_iterations=15)
    got = {r["id"]: (r["root_id"], r["depth"])
           for r in flat.filter(F.col("id").isin(0, 1, n - 2, n - 1)).collect()}
    assert got[0] == (0, 0) and got[1] == (0, 1)
    assert got[n - 1] == (0, n - 1) and got[n - 2] == (0, n - 2)


def test_new_operators_handle_empty_input(spark):
    """Every round-3 operator degrades to an empty result (not an
    error) on empty input — the guard for empty partitions/filters
    upstream in a composed pipeline."""
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        cooccurrence_lift, time_weighted_avg,
    )
    from tb_lakehouse_enhanced_spark.operators.hierarchy import (
        ancestor_closure, flatten_hierarchy,
    )
    from tb_lakehouse_enhanced_spark.operators.retrieval import bm25_topk

    no_docs = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(no_docs, ["x"]).count() == 0

    no_nodes = spark.createDataFrame([], "id long, parent_id long")
    assert flatten_hierarchy(no_nodes).count() == 0
    assert flatten_hierarchy(no_nodes, local_threshold=0).count() == 0
    assert ancestor_closure(no_nodes).count() == 0

    no_events = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, value double, "
            "event_type string")
    assert time_weighted_avg(no_events).count() == 0
    assert cooccurrence_lift(no_events).count() == 0
    assert cooccurrence_lift(no_events, method="join").count() == 0


def test_pq_index_write_probe_recall(spark, tmp_path):
    """The persisted PQ serving path (codes table + codebook table ->
    ADC scan -> keyed float fetch -> exact re-rank) recovers most exact
    neighbors and is deterministic across probes."""
    from tb_lakehouse_enhanced_spark.operators.similarity import (
        pq_probe_index, pq_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    path = str(tmp_path / "pq_index")
    pq_write_index(emb, path, m=8, nbits=6)

    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    got1 = {(r["query_id"], r["neighbor_id"])
            for r in pq_probe_index(spark, path, queries, emb, k=5).collect()}
    assert len(exact & got1) / len(exact) >= 0.6
    got2 = {(r["query_id"], r["neighbor_id"])
            for r in pq_probe_index(spark, path, queries, emb, k=5).collect()}
    assert got1 == got2


def test_allocate_quotas_hamilton(spark):
    from collections import Counter

    from tb_lakehouse_enhanced_spark.operators.sampling import allocate_quotas

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 37
    out = {r.grp: (r.n, r.quota) for r in
           allocate_quotas(docs, "lang", budget).collect()}
    # reference Hamilton allocation
    counts = Counter(r.lang for r in docs.select("lang").collect())
    N = sum(counts.values())
    fl = {g: budget * n // N for g, n in counts.items()}
    rem = sorted(counts, key=lambda g: (-(budget * counts[g] % N), g))
    left = budget - sum(fl.values())
    want = {g: fl[g] + (1 if i < left else 0) for i, g in enumerate(rem)}
    assert {g: q for g, (_, q) in out.items()} == want
    assert sum(q for _, q in out.values()) == budget
    # degenerate budgets: 0 allocates nothing; budget > N caps at N
    z = allocate_quotas(docs, "lang", 0).agg(F.sum("quota")).collect()[0][0]
    assert z == 0
    big = allocate_quotas(docs, "lang", 10 * N).agg(F.sum("quota")).collect()[0][0]
    assert big == N


def test_jaccard_prefix_join_equals_bruteforce(spark):
    """Prefix filtering is pure pruning: output must be IDENTICAL to
    the unblocked all-pairs formulation, including threshold-boundary
    pairs (the epsilon-guarded ceil)."""
    from tb_lakehouse_enhanced_spark.operators.dedup import (
        jaccard_near_dup, jaccard_prefix_join,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.5, 0.6, 2 / 3):
        brute = {(r.id_a, r.id_b) for r in
                 jaccard_near_dup(docs, threshold=t, block_col=None)
                 .collect()}
        fast = {(r.id_a, r.id_b) for r in
                jaccard_prefix_join(docs, threshold=t).collect()}
        assert fast == brute and brute
    # exact boundary: two 5-token sets sharing 3 tokens, J = 3/7; and
    # subset pair with J = 3/5 exactly at t=0.6
    tiny = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c"), (3, "x y z")],
        "doc_id long, text string")
    out = {(r.id_a, r.id_b) for r in
           jaccard_prefix_join(tiny, threshold=0.6).collect()}
    assert out == {(1, 2)}


def test_ivf_incremental_append_and_drift(spark, tmp_path):
    """Incremental IVF maintenance: batches appended against the
    persisted centroids keep probe recall vs exact top-k; in-
    distribution appends do NOT fire the drift trigger, a shifted
    batch DOES, and retraining resets the baseline."""
    import numpy as np
    from pyspark.sql import functions as F
    from tb_lakehouse_enhanced_spark.operators.similarity import (
        cosine_topk, ivf_append_partitioned, ivf_check_drift,
        ivf_load_meta, ivf_probe_partitioned, ivf_write_partitioned,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    # build from the first fifth, append the rest in 4 batches
    ivf_write_partitioned(emb.filter("vec_id % 5 = 0"), path, n_lists=8)
    for r in range(1, 5):
        ivf_append_partitioned(emb.filter(f"vec_id % 5 = {r}"), path)
    full = spark.read.parquet(path)
    assert full.count() == emb.count()

    centroids, _ = ivf_load_meta(path)
    queries = emb.filter("vec_id % 100 = 0")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_probe_partitioned(
                  spark, path, centroids, queries, k=5, n_probe=4).collect()}
    assert len(exact & approx) / len(exact) >= 0.5

    # in-distribution data: drift trigger stays quiet
    chk = ivf_check_drift(spark, path, threshold=1.5)
    assert not chk["drifted"], chk

    # a shifted batch (distribution moved) fires the trigger ...
    shifted = emb.limit(200).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(-1.0)).alias("embedding"))
    ivf_append_partitioned(shifted, path)
    chk2 = ivf_check_drift(spark, path, threshold=1.5)
    assert chk2["ratio"] > chk["ratio"]

    # ... and a retrain over the grown corpus resets the baseline
    ivf_write_partitioned(spark.read.parquet(path).drop("ivf_list"),
                          path + "2", n_lists=8)
    chk3 = ivf_check_drift(spark, path + "2", threshold=1.5)
    assert not chk3["drifted"], chk3


def test_interval_overlap_join_differential_and_outer(spark):
    """Bucketed interval-overlap join equals the brute-force overlap
    predicate, with pairs emitted exactly once even when they share
    many buckets; the left-outer variant keeps never-matched rows."""
    from tb_lakehouse_enhanced_spark.operators.rangejoin import (
        interval_overlap_join,
    )
    a = spark.createDataFrame(
        [(1, "2024-01-01", "2024-03-01"),   # long: spans many buckets
         (2, "2024-02-10", "2024-02-12"),
         (3, "2025-01-01", "2025-01-02")],  # matches nothing
        ["a_key", "s", "e"]).selectExpr(
        "a_key", "CAST(s AS DATE) AS a_start", "CAST(e AS DATE) AS a_end")
    b = spark.createDataFrame(
        [(10, "2024-01-15", "2024-02-20"),  # long overlap with 1 and 2
         (20, "2024-02-11", "2024-02-11"),  # zero-length (SQL predicate
         (30, "2024-02-29", "2024-03-05")],  # convention: still joins 2)
        ["b_key", "s", "e"]).selectExpr(
        "b_key", "CAST(s AS DATE) AS b_start", "CAST(e AS DATE) AS b_end")
    got = sorted((r.a_key, r.b_key) for r in
                 interval_overlap_join(a, b, "a_start", "a_end",
                                       "b_start", "b_end").collect())
    want = sorted((ra.a_key, rb.b_key)
                  for ra in a.collect() for rb in b.collect()
                  if ra.a_start < rb.b_end and rb.b_start < ra.a_end)
    assert got == want == [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20)]
    assert len(got) == len(set(got))        # exactly once each
    # left-outer: never-matched intervals are present (consume through
    # null-ignoring aggregates per the docstring — matched intervals'
    # extra bucket copies contribute NULL-partner rows too)
    outer = interval_overlap_join(a, b, "a_start", "a_end",
                                  "b_start", "b_end", how="left_outer")
    per_key = (outer.groupBy("a_key")
               .agg(F.count("b_key").alias("n_matches")).collect())
    assert {r.a_key: r.n_matches for r in per_key} == {1: 3, 2: 2, 3: 0}

    # NULL-bounded intervals: match nothing (SQL comparison with the
    # NULL bound is never true) yet SURVIVE outer joins — the outer
    # explode keeps them on a NULL bucket instead of dropping the row
    # with the empty sequence
    an = a.unionByName(spark.createDataFrame(
        [(4, None, "2024-02-01"), (5, "2024-02-01", None)],
        ["a_key", "s", "e"]).selectExpr(
        "a_key", "CAST(s AS DATE) AS a_start", "CAST(e AS DATE) AS a_end"))
    inner_n = sorted(set((r.a_key, r.b_key) for r in
                         interval_overlap_join(an, b, "a_start", "a_end",
                                               "b_start", "b_end").collect()))
    assert inner_n == [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20)]
    outer_n = interval_overlap_join(an, b, "a_start", "a_end",
                                    "b_start", "b_end", how="left_outer")
    per_key = {r.a_key: r.n_matches for r in
               outer_n.groupBy("a_key")
               .agg(F.count("b_key").alias("n_matches")).collect()}
    assert per_key == {1: 3, 2: 2, 3: 0, 4: 0, 5: 0}

    # same contract for the point-in-interval range_join
    from tb_lakehouse_enhanced_spark.operators.rangejoin import range_join
    pts = spark.createDataFrame([(100, "2024-02-11")], ["p_key", "t"]) \
        .selectExpr("p_key", "CAST(t AS TIMESTAMP) AS pt")
    iv = spark.createDataFrame(
        [(1, "2024-02-01", "2024-03-01"), (2, None, "2024-03-01")],
        ["i_key", "s", "e"]).selectExpr(
        "i_key", "CAST(s AS TIMESTAMP) AS i_start",
        "CAST(e AS TIMESTAMP) AS i_end")
    ro = range_join(pts, iv, "pt", "i_start", "i_end", how="right_outer")
    per_iv = {r.i_key: r.n for r in
              ro.groupBy("i_key").agg(F.count("p_key").alias("n")).collect()}
    assert per_iv == {1: 1, 2: 0}


def test_ivfpq_index_recall_and_prune(spark, tmp_path):
    """IVF-PQ serving index: probe recall vs exact top-k after the
    compressed partition-pruned scan + exact re-rank, and the probe's
    ivf_list predicate reaches the scan as a PartitionFilter."""
    from tb_lakehouse_enhanced_spark.operators.similarity import (
        cosine_topk, ivfpq_probe, ivfpq_write_index,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    ivfpq_write_index(emb, path, n_lists=8, m=8, nbits=6)
    queries = emb.filter("vec_id % 100 = 0")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    approx_df = ivfpq_probe(spark, path, queries, emb, k=5, n_probe=4,
                            rerank=8)
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    assert len(exact & approx) / len(exact) >= 0.5
    # deterministic across runs
    again = {(r["query_id"], r["neighbor_id"])
             for r in ivfpq_probe(spark, path, queries, emb, k=5,
                                  n_probe=4, rerank=8).collect()}
    assert approx == again
    # partition pruning: the codes scan carries a PartitionFilters
    # entry on ivf_list (not a post-scan filter)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_list" in plan


def test_edit_distance_join_differential(spark):
    """PassJoin-style segment-blocked edit-distance join equals the
    brute-force all-pairs filter at d = 0, 1, 2 — including the short-
    and empty-string edge cases where the pigeonhole argument needs the
    dedicated direct-pair branch."""
    import functools
    import random

    from tb_lakehouse_enhanced_spark.operators.editjoin import (
        edit_distance_join,
    )

    @functools.lru_cache(maxsize=None)
    def lev(a, b):
        if not a:
            return len(b)
        if not b:
            return len(a)
        return min(lev(a[1:], b) + 1, lev(a, b[1:]) + 1,
                   lev(a[1:], b[1:]) + (a[0] != b[0]))

    rng = random.Random(7)
    words = ["", "a", "b", "ab", "ba", "abc", "abcd", "xabc", "abca"] + \
        ["".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
         for _ in range(60)]
    L = list(enumerate(dict.fromkeys(words)))
    R = [(j + 1000, w) for j, (_, w) in enumerate(L)]
    ldf = spark.createDataFrame(L, "lid long, ls string")
    rdf = spark.createDataFrame(R, "rid long, rs string")
    for d in (0, 1, 2):
        got = sorted(tuple(r) for r in edit_distance_join(
            ldf, rdf, "lid", "ls", "rid", "rs", d).collect())
        want = sorted((i, j, lev(a, b))
                      for i, a in L for j, b in R if lev(a, b) <= d)
        assert got == want, f"d={d}"


def test_bm25_index_incremental_append_equals_rebuild(spark, tmp_path):
    """append_bm25_index: probes after N appends are IDENTICAL to a
    fresh full-corpus rebuild — df is derived at probe time from the
    pruned scan, so nothing stored goes stale, and the stats constants
    accumulate exactly (integer-valued doubles)."""
    from tb_lakehouse_enhanced_spark.operators.retrieval import (
        append_bm25_index, bm25_probe, build_bm25_index,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["customer", "window", "merge", "slow"]

    full = str(tmp_path / "full")
    build_bm25_index(docs, full, n_buckets=16)

    inc = str(tmp_path / "inc")
    build_bm25_index(docs.filter("doc_id % 3 = 0"), inc, n_buckets=16)
    append_bm25_index(docs.filter("doc_id % 3 = 1"), inc)
    append_bm25_index(docs.filter("doc_id % 3 = 2"), inc)

    want = sorted(map(tuple, bm25_probe(spark, full, terms, k=30).collect()))
    got = sorted(map(tuple, bm25_probe(spark, inc, terms, k=30).collect()))
    assert got == want and len(got) == 30


def test_bm25_index_compaction_preserves_probes(spark, tmp_path):
    """compact_bm25_index folds the per-batch ingest dirs into one
    versioned layout with an atomic stats flip: probes are unchanged,
    the replay guard still rejects applied batch ids, and the maintain
    policy fires on batch-count debt then goes quiet."""
    import json
    import os

    from tb_lakehouse_enhanced_spark.operators.retrieval import (
        append_bm25_index, bm25_probe, build_bm25_index,
        compact_bm25_index, maintain_bm25_index,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    build_bm25_index(docs.filter("doc_id % 4 = 0"), idx, n_buckets=16)
    for m in (1, 2, 3):
        append_bm25_index(docs.filter(f"doc_id % 4 = {m}"), idx)
    terms = ["customer", "window", "merge", "slow"]
    want = sorted(map(tuple, bm25_probe(spark, idx, terms, k=25).collect()))

    assert maintain_bm25_index(spark, idx, max_batches=2) == "compact"
    stats = json.load(open(os.path.join(idx, "_bm25_stats.json")))
    assert stats["dir"] == "postings_v1"
    # deferred removal: the superseded layout survives the flip so a
    # probe that loaded the PRE-flip stats can still list its files;
    # the next maintenance pass sweeps it
    assert os.path.isdir(os.path.join(idx, "postings"))
    assert sorted(map(tuple, bm25_probe(spark, idx, terms, k=25)
                  .collect())) == want
    assert maintain_bm25_index(spark, idx, max_batches=2) == "sweep"
    assert not os.path.isdir(os.path.join(idx, "postings"))
    # nothing superseded and one committed batch dir -> policy quiet
    assert maintain_bm25_index(spark, idx, max_batches=2) == "noop"
    # replay guard survives compaction: last_batch unchanged
    before = stats["n"]
    append_bm25_index(docs.limit(10), idx, batch_id=stats["last_batch"])
    after = json.load(open(os.path.join(idx, "_bm25_stats.json")))
    assert after["n"] == before
    # appends continue into the NEW layout
    extra = docs.limit(0)  # empty batch appends change nothing further
    compact_bm25_index(spark, idx)
    assert sorted(map(tuple, bm25_probe(spark, idx, terms, k=25)
                  .collect())) == want


def test_range_join_auto_tunes_width_and_matches_manual(spark):
    """Auto bucket width = median interval length (one aggregate);
    results are identical to the manual-width join, and degenerate
    inputs (all-NULL bounds / empty) fall back safely."""
    from tb_lakehouse_enhanced_spark.operators.rangejoin import (
        range_join, range_join_auto, tune_bucket_width_days,
    )
    iv = spark.createDataFrame(
        [(i, f"2024-01-{(i % 20) + 1:02d}", f"2024-02-{(i % 20) + 1:02d}")
         for i in range(40)], ["i_key", "s", "e"]).selectExpr(
        "i_key", "CAST(s AS TIMESTAMP) AS i_start",
        "CAST(e AS TIMESTAMP) AS i_end")
    assert tune_bucket_width_days(iv, "i_start", "i_end") == 31
    pts = spark.createDataFrame(
        [(j, f"2024-01-{(j % 28) + 1:02d}") for j in range(50)],
        ["p_key", "t"]).selectExpr("p_key", "CAST(t AS TIMESTAMP) AS pt")
    auto = sorted((r.p_key, r.i_key) for r in
                  range_join_auto(pts, iv, "pt", "i_start", "i_end").collect())
    manual = sorted((r.p_key, r.i_key) for r in
                    range_join(pts, iv, "pt", "i_start", "i_end",
                               bucket_width_days=31).collect())
    assert auto == manual and auto
    nulls = iv.selectExpr("i_key", "CAST(NULL AS TIMESTAMP) AS i_start",
                          "i_end")
    assert tune_bucket_width_days(nulls, "i_start", "i_end") == 1


def test_diversity_sample_quota_exact_and_deterministic(spark):
    """Embedding-cluster-balanced sampling: exactly `budget` rows out,
    per-cluster counts equal the Hamilton quotas of the full cluster
    distribution (within-1 proportionality), ids unique, and the draw
    is bit-stable across runs."""
    from tb_lakehouse_enhanced_spark.operators.sampling import (
        allocate_quotas, diversity_sample,
    )
    from tb_lakehouse_enhanced_spark.operators.similarity import (
        _kmeans_centroids, ivf_assign,
    )
    import numpy as np
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = diversity_sample(emb, budget=120, n_clusters=8)
    rows = out.collect()
    assert len(rows) == 120
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 120
    # per-cluster counts match the quotas computed from the same
    # assignment (proportionality within the largest-remainder rule)
    # recompute the expected centroids with the SAME deterministic
    # hash-bottom-n draw diversity_sample now trains on
    from tb_lakehouse_enhanced_spark.operators.similarity import (
        _train_sample_rows,
    )
    cents = _kmeans_centroids(
        np.array(_train_sample_rows(emb, "embedding", 2048),
                 dtype=np.float64), 8)
    assigned = ivf_assign(emb, cents).select(
        "vec_id", F.col("ivf_list").alias("cluster"))
    want = {r["grp"]: r["quota"] for r in
            allocate_quotas(assigned, "cluster", 120).collect()}
    got = {r["cluster"]: 0 for r in rows}
    for r in rows:
        got[r["cluster"]] += 1
    assert got == {k: v for k, v in want.items() if v > 0}
    again = sorted(map(tuple, diversity_sample(
        emb, budget=120, n_clusters=8).collect()))
    assert sorted(map(tuple, rows)) == again


def test_edit_distance_join_unicode_codepoints(spark):
    """Unicode contract: Spark's levenshtein (and substr/length, which
    the segment blocking uses) are CODEPOINT-based, so the join is
    exact at codepoint granularity — 'café'~'cafe' is distance 1 even
    though é is 2 UTF-8 bytes. (DuckDB's levenshtein is byte-based,
    which is why the registered query's oracle corpus is ASCII.)"""
    import functools

    from tb_lakehouse_enhanced_spark.operators.editjoin import (
        edit_distance_join,
    )

    @functools.lru_cache(maxsize=None)
    def lev(a, b):
        if not a:
            return len(b)
        if not b:
            return len(a)
        return min(lev(a[1:], b) + 1, lev(a, b[1:]) + 1,
                   lev(a[1:], b[1:]) + (a[0] != b[0]))

    words = ["café", "cafe", "caffé", "müller", "muller", "mülier",
             "北京大学", "北京大字", "日本語", "日本话", "ñandú", "nandú",
             "héllo wörld", "hello world"]
    L = list(enumerate(words))
    R = [(i + 100, w) for i, w in enumerate(words)]
    ldf = spark.createDataFrame(L, "lid long, ls string")
    rdf = spark.createDataFrame(R, "rid long, rs string")
    got = sorted(tuple(r) for r in edit_distance_join(
        ldf, rdf, "lid", "ls", "rid", "rs", 1).collect())
    want = sorted((i, j + 100, lev(a, b))
                  for i, a in L for j, b in enumerate(words)
                  if lev(a, b) <= 1)
    assert got == want
    assert (0, 101, 1) in got          # café ~ cafe: codepoint distance 1


def test_bm25_probe_many_equals_single_probes(spark, tmp_path):
    """Batch probing: one job over N queries returns exactly what N
    single probes return, with the rank window partitioned by query."""
    from tb_lakehouse_enhanced_spark.operators.retrieval import (
        bm25_probe, bm25_probe_many, build_bm25_index,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    build_bm25_index(docs, idx, n_buckets=16)
    qsets = {0: ["customer", "window"], 1: ["merge", "slow"],
             2: ["spark", "table", "value"]}
    qdf = spark.createDataFrame(
        [(qid, terms) for qid, terms in qsets.items()],
        "query_id long, terms array<string>")
    many = bm25_probe_many(spark, idx, qdf, k=15)
    got = {(r.query_id, r.doc_id, r.rank) for r in many.collect()}
    want = set()
    for qid, terms in qsets.items():
        for r in bm25_probe(spark, idx, terms, k=15).collect():
            want.add((qid, r.doc_id, r.rank))
    assert got == want and len(got) == 45


def test_quantizer_training_sample_partitioning_invariant(spark):
    """Quantizer training draws the hash-bottom-n sample, not an
    unordered limit() prefix: the sample — and hence centroids and IVF
    results — is identical under any repartitioning of the corpus
    (the unbiased-at-100TB contract; a prefix draw trains on whatever
    files answer first)."""
    import numpy as np

    from tb_lakehouse_enhanced_spark.operators.similarity import (
        _kmeans_centroids, _matrix, _train_sample_rows, ivf_topk,
    )
    import pandas as pd
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    s1 = _train_sample_rows(emb, "embedding", 256)
    s2 = _train_sample_rows(emb.repartition(13), "embedding", 256)
    s3 = _train_sample_rows(emb.repartition(3, "vec_id"), "embedding", 256)
    assert [list(v) for v in s1] == [list(v) for v in s2] \
        == [list(v) for v in s3]
    c1 = _kmeans_centroids(_matrix(pd.Series(s1)), 8)
    c2 = _kmeans_centroids(_matrix(pd.Series(s2)), 8)
    assert np.array_equal(c1, c2)
    q = emb.filter("vec_id < 3")
    r1 = sorted(map(tuple, ivf_topk(emb, q, k=5).collect()))
    r2 = sorted(map(tuple, ivf_topk(emb.repartition(13), q, k=5).collect()))
    assert r1 == r2 and r1


def test_bm25_empty_index_preserves_string_id_schema(spark, tmp_path):
    """A probe against an empty bootstrap index returns the SAME doc_id
    type the build recorded — string-keyed corpora must not get a
    schema-inconsistent 'long' empty frame (the type is read from
    _bm25_stats.json, not hardcoded)."""
    from tb_lakehouse_enhanced_spark.operators.retrieval import (
        append_bm25_index, bm25_probe, bm25_probe_many, build_bm25_index,
    )
    docs = spark.createDataFrame(
        [("d-1", "alpha beta"), ("d-2", "beta gamma")],
        "doc_id string, text string")
    idx = str(tmp_path / "sidx")
    build_bm25_index(docs.limit(0), idx, n_buckets=4)
    empty = bm25_probe(spark, idx, ["beta"])
    assert empty.schema["doc_id"].dataType.simpleString() == "string"
    assert empty.count() == 0
    qs = spark.createDataFrame([(0, ["beta"])],
                               "query_id long, terms array<string>")
    many = bm25_probe_many(spark, idx, qs)
    assert many.schema["doc_id"].dataType.simpleString() == "string"
    # after appending, probe schema matches the empty-probe schema
    append_bm25_index(docs, idx)
    got = bm25_probe(spark, idx, ["beta"])
    assert [(f.name, f.dataType) for f in got.schema] == \
        [(f.name, f.dataType) for f in empty.schema]
    assert got.count() == 2


def test_bm25_rebucket_preserves_probes_and_appends(spark, tmp_path):
    """rebucket_bm25_index re-spreads postings over a new bucket count
    with the compaction machinery's atomic flip: probes are unchanged,
    appends keep working against the NEW bucket count, and the replay
    guard survives."""
    import json
    import os

    from tb_lakehouse_enhanced_spark.operators.retrieval import (
        append_bm25_index, bm25_probe, build_bm25_index,
        maintain_bm25_index, rebucket_bm25_index,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "rb")
    build_bm25_index(docs.filter("doc_id % 2 = 0"), idx, n_buckets=8)
    append_bm25_index(docs.filter("doc_id % 4 = 1"), idx)
    terms = ["customer", "window", "merge", "slow"]
    want = sorted(map(tuple, bm25_probe(spark, idx, terms, k=25).collect()))

    stats = rebucket_bm25_index(spark, idx, n_buckets=32)
    assert stats["n_buckets"] == 32 and stats["dir"] == "postings_v1"
    assert stats["last_batch"] == 1            # replay guard preserved
    assert sorted(map(tuple, bm25_probe(spark, idx, terms, k=25)
                  .collect())) == want
    # appends continue under the new bucket count; final probes equal a
    # from-scratch rebuild over the full corpus
    append_bm25_index(docs.filter("doc_id % 4 = 3"), idx)
    full = str(tmp_path / "full")
    build_bm25_index(docs, full, n_buckets=32)
    assert sorted(map(tuple, bm25_probe(spark, idx, terms, k=25)
                  .collect())) == \
        sorted(map(tuple, bm25_probe(spark, full, terms, k=25).collect()))
    # superseded layout swept by maintenance
    assert maintain_bm25_index(spark, idx, max_batches=8) == "sweep"
    assert not os.path.isdir(os.path.join(idx, "postings"))
