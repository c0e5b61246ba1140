"""Consumption analytics operators — value-level semantic checks."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.analytics import (
    cohort_retention, dq_expectations, funnel, fuzzy_match, kmv_distinct,
    profile_table, quantile_panel, value_histogram,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, h), t) for u, d, h, t in rows],
        "user_id long, ts timestamp, event_type string")


def test_cohort_retention_offsets(spark):
    # u1 first seen week of Jan 1 (Mon), active again week of Jan 8;
    # u2 first seen week of Jan 8 only.
    ev = _events(spark, [(1, 2, 0, "view"), (1, 9, 0, "view"),
                         (2, 10, 0, "view")])
    got = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 1): 1,
                   ("2024-01-08", 0): 1}


def test_funnel_strict_ordering(spark):
    # u1 completes view->click; u2 clicked BEFORE viewing (no step 2);
    # u3 view->click->purchase.
    ev = _events(spark, [
        (1, 1, 1, "view"), (1, 1, 2, "click"),
        (2, 2, 5, "click"), (2, 2, 6, "view"),
        (3, 3, 1, "view"), (3, 3, 2, "click"), (3, 3, 3, "purchase")])
    rows = {r["step"]: r for r in
            funnel(ev, ["view", "click", "purchase"]).collect()}
    assert rows["view"]["n_users"] == 3
    assert rows["click"]["n_users"] == 2
    assert rows["purchase"]["n_users"] == 1
    assert rows["purchase"]["conversion"] == 1 / 3


def test_funnel_first_touch_binding(spark):
    # the click at h2 binds (earliest after view); the later purchase at
    # h3 counts even though another click happened at h4
    ev = _events(spark, [(1, 1, 1, "view"), (1, 1, 2, "click"),
                         (1, 1, 3, "purchase"), (1, 1, 4, "click")])
    rows = {r["step"]: r["n_users"] for r in
            funnel(ev, ["view", "click", "purchase"]).collect()}
    assert rows == {"view": 1, "click": 1, "purchase": 1}


def test_profile_table_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, None, 4.0), (2, "b", None)],
        "k long, s string, v double")
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["k"]["n_rows"] == 3 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 2.0
    assert got["k"]["min_str"] is None
    assert got["s"]["n_null"] == 1 and got["s"]["min_str"] == "a"
    assert got["s"]["min_num"] is None
    assert got["v"]["n_null"] == 1 and got["v"]["max_num"] == 4.0


def test_dq_expectations_single_scan(spark):
    df = spark.createDataFrame([(1, 5.0), (2, -1.0), (None, 2.0)],
                               "k long, v double")
    got = {r["rule"]: r for r in dq_expectations(df, [
        ("null_key", F.col("k").isNull()),
        ("neg_v", F.col("v") < 0),
        ("huge_v", F.col("v") > 100)]).collect()}
    assert got["null_key"]["n_violations"] == 1 and not got["null_key"]["passed"]
    assert got["neg_v"]["n_violations"] == 1
    assert got["huge_v"]["n_violations"] == 0 and got["huge_v"]["passed"]
    assert all(r["n_checked"] == 3 for r in got.values())


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([("a", i % 7) for i in range(100)],
                               "g string, v long")
    [row] = kmv_distinct(df, ["g"], "v", k=64).collect()
    assert row["est_distinct"] == 7.0  # fewer than k hashes -> exact


def test_kmv_estimates_above_k(spark):
    df = spark.createDataFrame([("a", i) for i in range(5000)],
                               "g string, v long")
    [row] = kmv_distinct(df, ["g"], "v", k=256).collect()
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.2  # ~1/sqrt(k) error


def test_value_histogram_clamps_edges(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,)],
                               "x double")
    got = {r["bucket"]: r for r in
           value_histogram(df, "x", 0.0, 20.0, 2).collect()}
    assert got[0]["n"] == 3          # -5 clamped in, 0, 9.9
    assert got[1]["n"] == 2          # 10.0, 25.0 clamped in
    assert got[0]["bin_lo"] == 0.0 and got[0]["bin_hi"] == 10.0
    assert got[1]["bin_hi"] == 20.0


def test_quantile_panel_exact_values(spark):
    df = spark.createDataFrame([("a", float(v)) for v in range(1, 11)],
                               "g string, v double")
    [row] = quantile_panel(df, ["g"], "v", qs=(0.5, 0.9)).collect()
    # percentile_disc returns actual members: 10 values 1..10
    assert row["q50"] == 5.0 and row["q90"] == 9.0


def test_fuzzy_match_picks_nearest(spark):
    master = spark.createDataFrame(
        [(1, "alpha", 0), (2, "beta", 0), (3, "gamma", 0)],
        "id long, name string, blk int")
    dirty = spark.createDataFrame([(10, "alphq", 0), (20, "betaa", 0)],
                                  "dk long, dn string, blk int")
    got = {r["dirty_key"]: r for r in
           fuzzy_match(dirty, master, "dk", "id", "dn", "name",
                       block_cols=[("blk", "blk")]).collect()}
    assert got[10]["matched_key"] == 1 and got[10]["distance"] == 1
    assert got[20]["matched_key"] == 2 and got[20]["distance"] == 1


def test_fuzzy_match_threshold_leaves_null(spark):
    master = spark.createDataFrame([(1, "alpha", 0)], "id long, name string, blk int")
    dirty = spark.createDataFrame([(10, "zzzzz", 0)], "dk long, dn string, blk int")
    [row] = fuzzy_match(dirty, master, "dk", "id", "dn", "name",
                        block_cols=[("blk", "blk")], max_distance=2).collect()
    assert row["matched_key"] is None and row["distance"] is None


def test_enforce_expectations_fail_lists_rules(spark):
    import pytest
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        ExpectationError, enforce_expectations)
    df = spark.createDataFrame([(1, 5.0), (None, -2.0)], "k long, v double")
    rules = [("null_key", F.col("k").isNull()), ("neg_v", F.col("v") < 0)]
    with pytest.raises(ExpectationError) as ei:
        enforce_expectations(df, rules, action="fail")
    assert ei.value.failures == [("neg_v", 1), ("null_key", 1)]


def test_enforce_expectations_drop_quarantines(spark):
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        enforce_expectations)
    df = spark.createDataFrame([(1, 5.0), (None, 2.0), (3, -1.0)],
                               "k long, v double")
    out, report = enforce_expectations(
        df, [("null_key", F.col("k").isNull()), ("neg_v", F.col("v") < 0)],
        action="drop")
    assert [r["k"] for r in out.collect()] == [1]
    assert {r["rule"]: r["n_violations"] for r in report.collect()} \
        == {"null_key": 1, "neg_v": 1}


def test_enforce_expectations_warn_passes_through(spark):
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        enforce_expectations)
    df = spark.createDataFrame([(1, -5.0)], "k long, v double")
    out, report = enforce_expectations(
        df, [("neg_v", F.col("v") < 0)], action="warn")
    assert out.count() == 1
    assert report.collect()[0]["n_violations"] == 1


def test_funnel_max_gap_bounds_conversion_window(spark):
    from tb_lakehouse_enhanced_spark.operators.analytics import funnel
    ev = _events(spark, [(1, 1, 1, "view"), (1, 1, 3, "click"),    # 2h gap
                         (2, 1, 1, "view"), (2, 2, 1, "click")])   # 24h gap
    rows = {r["step"]: r["n_users"] for r in
            funnel(ev, ["view", "click"], max_gap="INTERVAL 6 HOURS").collect()}
    assert rows == {"view": 2, "click": 1}  # only the 2h conversion counts


def test_profile_approx_distinct_mode(spark):
    df = spark.createDataFrame([(i % 50, "x") for i in range(1000)],
                               "k long, s string")
    got = {r["column"]: r for r in
           profile_table(df, exact_distinct=False).collect()}
    assert abs(got["k"]["n_distinct"] - 50) <= 5   # HLL++ approximation
    assert got["s"]["n_distinct"] == 1


def test_time_weighted_avg_hand_case(spark):
    from datetime import datetime
    from tb_lakehouse_enhanced_spark.operators.analytics import time_weighted_avg

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: 10.00 held 2s, 20.00 held 6s -> twap = (10*2+20*6)/8 = 17.5
        (1, 1, t(0), 10.00), (2, 1, t(2), 20.00), (3, 1, t(8), 99.0),
        # user 2: single event -> dropped
        (4, 2, t(0), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r["user_id"]: r for r in time_weighted_avg(df).collect()}
    assert 2 not in got
    r1 = got[1]
    assert r1["n_intervals"] == 2
    assert r1["total_dur_us"] == 8_000_000
    assert r1["twap_milli"] == 17_500


def test_cooccurrence_lift_hand_case(spark):
    from tb_lakehouse_enhanced_spark.operators.analytics import cooccurrence_lift

    # 4 users: {a,b} {a,b} {a} {b,c}  -> n_a=3 n_b=3 n_both(a,b)=2
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "b"),
            (3, "a"), (4, "b"), (4, "c")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {(r["item_a"], r["item_b"]): r
           for r in cooccurrence_lift(df).collect()}
    ab = got[("a", "b")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    assert ab["support_milli"] == 500          # 2/4
    assert ab["confidence_milli"] == 666       # 2/3 floored
    assert ab["lift_milli"] == 888             # (2*4)/(3*3) = 0.888...
    bc = got[("b", "c")]
    assert bc["n_both"] == 1 and bc["lift_milli"] == 1333  # (1*4)/(3*1)
    assert ("a", "c") not in got

    # the self-join formulation is result-identical to the array path
    joined = {(r["item_a"], r["item_b"]): tuple(r)
              for r in cooccurrence_lift(df, method="join").collect()}
    assert joined == {k: tuple(v) for k, v in got.items()}


def test_time_weighted_avg_randomized_vs_reference(spark):
    import random
    from datetime import datetime, timedelta

    from tb_lakehouse_enhanced_spark.operators.analytics import time_weighted_avg

    rng = random.Random(7)
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(6):
        for _ in range(rng.randrange(1, 15)):
            ts = base + timedelta(seconds=rng.randrange(0, 10**6))
            rows.append((eid, user, ts, rng.randrange(0, 50000) / 100))
            eid += 1
    # inject timestamp ties to exercise the (ts, event_id) tie-break
    rows.append((eid, 0, rows[0][2], 123.45)); eid += 1

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r["user_id"]: (r["n_intervals"], r["total_dur_us"], r["twap_milli"])
           for r in time_weighted_avg(df).collect()}

    from collections import defaultdict
    per = defaultdict(list)
    for e, u, ts, v in rows:
        per[u].append((ts, e, round(v * 100)))
    for u, evs in per.items():
        evs.sort()
        ws = ds = 0
        for (t0, _, c0), (t1, _, _) in zip(evs, evs[1:]):
            dur = int((t1 - t0).total_seconds() * 1_000_000)
            ws += c0 * dur
            ds += dur
        if ds > 0:
            assert got[u] == (len(evs) - 1, ds, (ws * 10) // ds), u
        else:
            assert u not in got


def test_distribution_drift_exact(spark):
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        distribution_drift,
    )
    rows = ([("x", True)] * 3 + [("y", True)] * 1
            + [("x", False)] * 1 + [("z", False)] * 2)
    items = spark.createDataFrame(rows, "item string, flag boolean")
    out = {r.item: r for r in
           distribution_drift(items, "item", "flag").collect()}
    # na=4, nb=3, v=3 -> denominators 7 and 6
    assert (out["x"].cnt_a, out["x"].cnt_b) == (3, 1)
    p, q = 4 / 7, 2 / 6
    assert abs(out["x"].drift - (p - q) ** 2 / (p + q)) < 1e-15
    # z absent from side A still finite via smoothing
    p, q = 1 / 7, 3 / 6
    assert abs(out["z"].drift - (p - q) ** 2 / (p + q)) < 1e-15


def test_countmin_overestimates_and_merges(spark):
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        countmin_estimate, countmin_sketch,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = docs.select(F.explode(
        F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w"))
    sketch = countmin_sketch(tok, "w", width=128, depth=3)
    truth = tok.groupBy("w").count()
    probes = truth.limit(50).select("w")
    est = countmin_estimate(sketch, probes, "w", width=128, depth=3)
    joined = est.join(truth, "w").collect()
    assert joined and all(r.cms_est >= r["count"] for r in joined)
    # mergeability: cell-wise sum of two half-corpus sketches == full
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    def sk(d):
        t = d.select(F.explode(
            F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w"))
        return countmin_sketch(t, "w", width=128, depth=3)
    merged = (sk(half_a).unionByName(sk(half_b))
              .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")))
    diff = (merged.exceptAll(sketch).count()
            + sketch.exceptAll(merged).count())
    assert diff == 0


def test_countmin_never_seen_probe_is_zero(spark):
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        countmin_estimate, countmin_sketch,
    )
    items = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2,
                                  "w string")
    sketch = countmin_sketch(items, "w", width=512, depth=4)
    probes = spark.createDataFrame(
        [("a",), ("never-seen-item-xyz",)], "w string")
    out = {r.w: r.cms_est for r in
           countmin_estimate(sketch, probes, "w", width=512, depth=4)
           .collect()}
    # the unseen item must appear with estimate 0 (empty cells win the
    # MIN), not vanish from the output
    assert out["never-seen-item-xyz"] == 0
    assert out["a"] >= 5


def test_grouped_ols_matches_closed_form(spark):
    """OLS on a hand-built exact line plus one noisy group."""
    import numpy as np
    from tb_lakehouse_enhanced_spark.operators.analytics import grouped_ols
    rows = [("exact", float(x), 2.0 * x + 5.0) for x in range(1, 21)]
    rng = np.random.default_rng(3)
    xs = rng.integers(1, 100, 50)
    noise = rng.integers(-300, 300, 50) / 100.0
    rows += [("noisy", float(x), round(float(3.0 * x - 7.0 + e), 2))
             for x, e in zip(xs, noise)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in
           grouped_ols(df, "x", "y", by=["g"]).collect()}
    assert abs(out["exact"]["slope"] - 2.0) < 1e-9
    assert abs(out["exact"]["intercept"] - 5.0) < 1e-9
    assert abs(out["exact"]["r2"] - 1.0) < 1e-9
    # numpy polyfit reference for the noisy group
    b, a = np.polyfit(xs.astype(float),
                      np.array([r[2] for r in rows if r[0] == "noisy"]), 1)
    assert abs(out["noisy"]["slope"] - b) < 1e-6
    assert abs(out["noisy"]["intercept"] - a) < 1e-5
    assert 0.9 < out["noisy"]["r2"] <= 1.0


def test_logistic_fit_matches_numpy_reference(spark):
    """Aggregate-based IRLS equals the NumPy twin on the same rows to
    1e-6, separates a planted signal, and the codegen scorer ranks the
    classes correctly."""
    import numpy as np

    from tb_lakehouse_enhanced_spark.operators.mlfit import (
        logistic_fit, logistic_fit_reference, logistic_score,
    )
    rng = np.random.default_rng(11)
    n = 4000
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n) * 2.0 + 1.0
    x3 = rng.normal(size=n)
    eta = 0.8 * x1 - 1.3 * x2 + 0.5      # x3 is noise
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    rows = [(float(a), float(b), float(c), float(t))
            for a, b, c, t in zip(x1, x2, x3, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double, "
                                     "y double").repartition(8)

    model = logistic_fit(df, ["x1", "x2", "x3"], "y", iters=8)
    b0, w = logistic_fit_reference(np.column_stack([x1, x2, x3]), y,
                                   iters=8)
    assert abs(model["intercept"] - b0) < 1e-6
    for i, c in enumerate(["x1", "x2", "x3"]):
        assert abs(model["weights"][c] - w[i]) < 1e-6, c
    # recovered direction: strong planted weights, noise feature small
    assert model["weights"]["x2"] < -1.0
    assert model["weights"]["x1"] > 0.5
    assert abs(model["weights"]["x3"]) < 0.2
    assert model["n"] == n and model["final_nll"] < 0.69  # beats chance

    scored = logistic_score(df, model)
    auc_proxy = (scored.filter("y = 1.0").agg(F.avg("score")).collect()[0][0]
                 - scored.filter("y = 0.0").agg(F.avg("score")).collect()[0][0])
    assert auc_proxy > 0.2                # classes clearly separated


def test_observe_expectations_one_pass_metrics(spark, tmp_path):
    """Observation-based expectations: violation counters ride the
    consuming job itself (a parquet write here) — same counts as the
    report panel, no second scan."""
    from tb_lakehouse_enhanced_spark.operators.analytics import (
        dq_expectations, observe_expectations,
    )
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 8.0)], "id int, v double")
    rules = [("v_nonnull", F.col("v").isNull()),
             ("v_positive", F.col("v") < 0)]
    observed, obs = observe_expectations(df, rules)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 4
    assert got["viol__v_nonnull"] == 1
    assert got["viol__v_positive"] == 1
    # identical counts to the scan-based report panel
    panel = {r["rule"]: r["n_violations"]
             for r in dq_expectations(df, rules).collect()}
    assert panel == {"v_nonnull": 1, "v_positive": 1}
    # and the written data is untouched (metrics-only, no filtering)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4
