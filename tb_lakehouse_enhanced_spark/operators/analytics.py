"""Consumption-layer analytics operators: cohorts, funnels, profiling,
data-quality expectations, cardinality sketches, histograms, quantiles
and fuzzy entity matching.

The reference's consumption layer is a BI dashboard over the gold star
schema (reference dashboard_example.pbix; SURVEY.md §2.4) — these are
the next queries such a deployment grows into: user-behavior analytics
on the event stream, data-quality gates on the silver tables, and
profile/cardinality panels an operator dashboard needs. All pure
DataFrame compositions (no UDFs), each with a DuckDB-expressible oracle.

Scale notes per operator are inline; the common theme is one shuffle on
the natural key, broadcast for per-group scalars, and window functions
always PARTITIONed (never a global single-task window).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash60


# ----------------------------------------------------------- cohorts --------

def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention matrix.

    cohort_week = Monday of the user's first event; one output row per
    (cohort_week, week_offset) with the distinct users active that week.

    Scale: the first-seen aggregation shuffles on ``user_col`` once
    (map-side partial min); the events←cohort join is a co-partitioned
    shuffle join on the same key (at 100 TB the per-user relation is
    ~|users| rows — far smaller than events — and AQE picks a broadcast
    when it fits). The final count is a two-level agg on a small key
    space (weeks x offsets).
    """
    wk = lambda c: F.date_trunc("week", c).cast("date")
    first_seen = (events.groupBy(user_col)
                  .agg(F.min(ts_col).alias("_first_ts"))
                  .select(user_col, wk("_first_ts").alias("cohort_week")))
    active = events.select(user_col, wk(ts_col).alias("_active_week"))
    return (active.join(first_seen, user_col)
            .groupBy("cohort_week",
                     F.floor(F.datediff("_active_week", "cohort_week") / 7)
                     .cast("int").alias("week_offset"))
            .agg(F.countDistinct(user_col).alias("n_users"))
            .orderBy("cohort_week", "week_offset"))


def funnel(events: DataFrame, steps: Sequence[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           max_gap: Column | str | None = None) -> DataFrame:
    """Strictly-ordered conversion funnel over an event stream.

    A user reaches step *i* when an event of type ``steps[i]`` exists
    with a timestamp strictly after the timestamp at which the user
    reached step *i-1* (first-touch semantics: each step binds to the
    EARLIEST qualifying event). ``max_gap`` (an INTERVAL expression,
    e.g. ``"INTERVAL 7 DAYS"``) additionally bounds each step-to-step
    gap — the "converted within a week" funnel. Output: one row per
    step with the users reaching it and the conversion rate vs step 1.

    Scale: one filtered scan per step, each aggregated per user with a
    map-side-combining min — shuffles are all on ``user_col`` so every
    join after the first is co-partitioned (AQE reuses the exchange).
    len(steps) is small and fixed; no window over the whole stream, no
    per-user event arrays collected.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    by_type = {s: events.filter(F.col(type_col) == s)
               .select(user_col, F.col(ts_col).alias("_ts")) for s in steps}

    gap = F.expr(max_gap) if isinstance(max_gap, str) else max_gap
    reached = (by_type[steps[0]].groupBy(user_col)
               .agg(F.min("_ts").alias("_step_ts")))
    stages = [reached]
    for s in steps[1:]:
        nxt = by_type[s].withColumnRenamed("_ts", "_cand_ts")
        cond = F.col("_cand_ts") > F.col("_step_ts")
        if gap is not None:
            cond = cond & (F.col("_cand_ts") <= F.col("_step_ts") + gap)
        reached = (nxt.join(stages[-1], user_col)
                   .filter(cond)
                   .groupBy(user_col)
                   .agg(F.min("_cand_ts").alias("_step_ts")))
        stages.append(reached)

    counts = [st.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit(i + 1).alias("step_index"),
                      F.lit(steps[i]).alias("step"), "n_users")
              for i, st in enumerate(stages)]
    out = reduce(lambda a, b: a.unionByName(b), counts)
    base = counts[0].select(F.col("n_users").alias("_base"))
    return (out.crossJoin(F.broadcast(base))
            .select("step_index", "step", "n_users",
                    (F.col("n_users") / F.col("_base")).alias("conversion"))
            .orderBy("step_index"))


# ---------------------------------------------------- profiling / DQ --------

def profile_table(df: DataFrame, cols: Sequence[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """Per-column profile panel: rows, nulls, distincts, numeric min/max.

    One wide aggregate computes every statistic in a single scan, then a
    ``stack`` unpivot reshapes to one row per column. Numeric extremes
    are reported as DOUBLE and string extremes as separate string
    columns — never numeric-cast-to-string, whose formatting is
    engine-specific and would poison cross-engine comparison.

    Scale: multiple count(distinct) in one aggregate plan via Expand
    (one scan, data replicated x|cols| into the shuffle).
    ``exact_distinct=False`` swaps in ``approx_count_distinct`` (HLL++),
    which needs NO Expand — bounded sketch state per column, the right
    default for very wide tables at 100 TB (engine-internal: approx
    values are not cross-engine comparable, so the oracle-checked query
    keeps exact).
    """
    cols = list(cols or df.columns)
    numeric = {f.name for f in df.schema.fields
               if f.dataType.typeName() in
               ("integer", "long", "short", "byte", "double", "float", "decimal")}
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    dist = (F.count_distinct if exact_distinct
            else lambda c: F.approx_count_distinct(c).cast("long"))
    for c in cols:
        aggs += [F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
                 dist(F.col(c)).alias(f"_dist_{c}")]
        if c in numeric:
            aggs += [F.min(c).cast("double").alias(f"_min_{c}"),
                     F.max(c).cast("double").alias(f"_max_{c}")]
        else:
            aggs += [F.min(c).cast("string").alias(f"_smin_{c}"),
                     F.max(c).cast("string").alias(f"_smax_{c}")]
    wide = df.agg(*aggs)

    def _field(c: str, kind: str, num_tpl: str, str_tpl: str) -> str:
        return (num_tpl.format(c=c) if c in numeric else str_tpl.format(c=c))

    rows = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, "
        + _field(c, "min", "_min_{c}, ", "CAST(NULL AS DOUBLE), ")
        + _field(c, "max", "_max_{c}, ", "CAST(NULL AS DOUBLE), ")
        + _field(c, "smin", "CAST(NULL AS STRING), ", "_smin_{c}, ")
        + _field(c, "smax", "CAST(NULL AS STRING)", "_smax_{c}")
        for c in cols)
    return (wide.selectExpr(
        "_n",
        f"stack({len(cols)}, {rows}) AS "
        "(column, n_null, n_distinct, min_num, max_num, min_str, max_str)")
        .select(F.col("column"), F.col("_n").alias("n_rows"),
                "n_null", "n_distinct", "min_num", "max_num",
                "min_str", "max_str"))


def dq_expectations(df: DataFrame,
                    rules: Sequence[tuple[str, Column]]) -> DataFrame:
    """Data-quality expectation report: one row per rule.

    ``rules`` is ``[(rule_name, violation_predicate_column), ...]`` — the
    predicate flags BAD rows. Output: rule, n_checked, n_violations,
    passed. All rules evaluate in ONE scan (a sum(CASE) per rule inside
    a single aggregate), then unpivot — adding a rule adds an expression,
    not a pass over the data.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in rules:
        # coalesce: SUM over zero rows (an EMPTY table being validated,
        # e.g. add_constraint right after CREATE TABLE) or all-NULL
        # predicates is NULL — which is zero violations, not a crash in
        # the fail-action comparison
        aggs.append(F.coalesce(F.sum(pred.cast("long")), F.lit(0))
                    .alias(f"_v_{name}"))
    wide = df.agg(*aggs)
    rows = ", ".join(f"'{name}', _v_{name}" for name, _ in rules)
    return (wide.selectExpr("_n", f"stack({len(rules)}, {rows}) AS (rule, n_violations)")
            .select("rule", F.col("_n").alias("n_checked"),
                    "n_violations",
                    (F.col("n_violations") == 0).alias("passed"))
            .orderBy("rule"))


class ExpectationError(Exception):
    """Raised when a ``fail``-action expectation is violated."""

    def __init__(self, failures: list[tuple[str, int]]):
        self.failures = failures
        super().__init__("expectations violated: " + ", ".join(
            f"{name} ({n} rows)" for name, n in failures))


def enforce_expectations(df: DataFrame,
                         rules: Sequence[tuple[str, Column]],
                         action: str = "fail"):
    """Gate a write on data-quality expectations (the DLT pattern).

    ``rules`` = [(name, violation_predicate)], ``action`` one of:

    - ``"fail"``: any violation raises :class:`ExpectationError` listing
      per-rule counts — nothing downstream sees bad rows;
    - ``"drop"``: violating rows are filtered out (quarantine-by-drop);
    - ``"warn"``: rows pass through untouched, the report records counts.

    Returns ``(df_out, report)`` where ``report`` is the
    :func:`dq_expectations` panel. The report is one scan and the drop
    filter another — same shape as DLT (metrics + enforcement); reuse a
    cached input when the extra scan matters. The drop filter treats a
    NULL predicate as "not a violation" (null-safe), matching the
    report's count semantics.
    """
    if action not in ("fail", "drop", "warn"):
        raise ValueError(f"unknown action {action!r}")
    report = dq_expectations(df, rules)
    if action == "fail":
        bad = [(r["rule"], r["n_violations"])
               for r in report.collect() if r["n_violations"] > 0]
        if bad:
            raise ExpectationError(sorted(bad))
        return df, report
    if action == "drop":
        keep = reduce(lambda a, b: a & b,
                      (~pred.eqNullSafe(F.lit(True)) for _, pred in rules))
        return df.filter(keep), report
    return df, report


def observe_expectations(df: DataFrame,
                         rules: Sequence[tuple[str, Column]],
                         name: str = "expectations"):
    """Zero-extra-scan expectation metrics via Spark's ``Observation``
    API: violation counters ride the SAME job that consumes ``df``
    (the write, the aggregate, whatever runs it) instead of a separate
    report scan — the metrics half of DLT's warn mode at true
    one-pass cost, and the right shape when ``enforce_expectations``'s
    extra scan matters (a 100 TB write should not be scanned twice for
    counters).

    Returns ``(df_observed, observation)``; after ANY action on the
    returned frame, ``observation.get`` yields
    ``{"n_rows": N, "viol__<rule>": count, ...}``. Gate-AFTER-write
    semantics: callers that must abort on violations check the counts
    post-action and compensate (e.g. ManagedTable.restore) — pre-write
    gating inherently needs its own pass, which is what
    ``enforce_expectations(action="fail")`` is for.

    NULL predicate counts as "not a violation" (same null-safe
    semantics as the report panel).
    """
    from pyspark.sql import Observation
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(pred.eqNullSafe(F.lit(True)).cast("long"))
        .alias(f"viol__{rule}")
        for rule, pred in rules]
    return df.observe(obs, *metrics), obs


# ----------------------------------------------------------- sketches -------

_KMV_SPACE = float(1 << 60)


def kmv_distinct(df: DataFrame, group_cols: Sequence[str], col: str,
                 k: int = 256, portable: bool = True) -> DataFrame:
    """K-minimum-values distinct-count sketch per group (Bar-Yossef et al.,
    "Counting distinct elements in a data stream", RANDOM 2002).

    Hash every value to a uniform 60-bit integer, keep the k smallest
    DISTINCT hashes per group; if fewer than k hashes exist the count is
    exact, else estimate (k-1) / (h_k / 2^60). Fully deterministic: the
    estimator is arithmetic on an order statistic, so any engine hashing
    with the same function produces the identical estimate — with
    ``portable=True`` the hash is the md5-60bit family a SQL oracle can
    mirror; production uses xxhash64.

    Scale: the inner distinct and the top-k window both shuffle on
    ``group_cols`` (the window is PARTITIONed — parallel across groups).
    Sketch size k bounds per-group state; this is the mergeable-sketch
    shape (union = min-merge of hash sets), so partial sketches from
    independent partitions/days can be combined without rescanning.
    """
    h = portable_hash60(F.col(col).cast("string")) if portable \
        else F.xxhash64(F.col(col).cast("string")).bitwiseAND(F.lit((1 << 60) - 1))
    hashed = (df.select(*group_cols, h.alias("_h"))
              .groupBy(*group_cols, "_h").agg(F.lit(1)))  # distinct hashes
    w = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = hashed.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    return (ranked.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("_m"), F.max("_h").alias("_hk"))
            .select(*group_cols,
                    F.when(F.col("_m") < k, F.col("_m").cast("double"))
                    .otherwise((F.lit(float(k - 1)))
                               / (F.col("_hk") / F.lit(_KMV_SPACE)))
                    .alias("est_distinct"))
            .orderBy(*group_cols))


def value_histogram(df: DataFrame, col: str, lo: float, hi: float,
                    nbins: int) -> DataFrame:
    """Fixed-width histogram with clamped edge bins.

    bucket i covers [lo + i*w, lo + (i+1)*w); values below ``lo`` land in
    bucket 0, values at/above ``hi`` in bucket nbins-1 (explicit floor
    arithmetic rather than ``width_bucket`` so the identical IEEE ops run
    on any SQL engine). One scan + one small-key aggregation; empty
    buckets are not emitted (join a bucket spine if a dense axis is
    needed).
    """
    w = (hi - lo) / nbins
    bucket = F.least(F.greatest(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(nbins - 1)).cast("int")
    return (df.filter(F.col(col).isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("bucket",
                    (F.lit(lo) + F.col("bucket") * F.lit(w)).alias("bin_lo"),
                    (F.lit(lo) + (F.col("bucket") + 1) * F.lit(w)).alias("bin_hi"),
                    "n")
            .orderBy("bucket"))


def quantile_panel(df: DataFrame, group_cols: Sequence[str], col: str,
                   qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9)) -> DataFrame:
    """Exact discrete quantiles per group (``percentile_disc`` — returns
    actual data values, so results are engine-portable; the continuous
    variant interpolates and is kept engine-internal).

    Scale: percentile_disc is a sort-based aggregate per group — one
    shuffle on ``group_cols``; for heavy groups at 100 TB swap in
    approx_percentile (t-digest) where cross-engine exactness is not
    required.
    """
    aggs = [F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})")
            .alias(f"q{int(q * 100)}") for q in qs]
    return df.groupBy(*group_cols).agg(*aggs).orderBy(*group_cols)


# ------------------------------------------------- fuzzy entity match -------

def fuzzy_match(dirty: DataFrame, master: DataFrame, dirty_key: str,
                master_key: str, dirty_name: str, master_name: str,
                block_cols: Sequence[tuple[str, str]] = (),
                max_distance: int | None = None) -> DataFrame:
    """Entity resolution: nearest master record by Levenshtein distance.

    For each dirty row, candidates are generated inside blocking
    partitions (``block_cols`` = [(dirty_col, master_col), ...] plus an
    implicit name-length band of ±2), scored with edit distance, and the
    best match selected deterministically (min distance, then min master
    key). ``max_distance`` optionally drops matches worse than the
    threshold (row keeps NULL master — a left join).

    Scale: the classic blocking design — the quadratic candidate space is
    confined to blocks, the join is an equi-join on the blocking key
    (shuffle on block), and the argmin is a PARTITIONed window per dirty
    key. Block hard enough that the largest block's candidate product
    fits a task; skewed blocks can be salted with
    operators.skew.salted_join.
    """
    d = dirty.alias("d")
    m = master.alias("m")
    conds = [F.col(f"d.{a}") == F.col(f"m.{b}") for a, b in block_cols]
    conds.append(
        F.abs(F.length(F.col(f"d.{dirty_name}"))
              - F.length(F.col(f"m.{master_name}"))) <= 2)
    cand = d.join(m, reduce(lambda x, y: x & y, conds), "inner")
    dist = F.levenshtein(F.col(f"d.{dirty_name}"), F.col(f"m.{master_name}"))
    scored = cand.select(
        F.col(f"d.{dirty_key}").alias("dirty_key"),
        F.col(f"d.{dirty_name}").alias("dirty_name"),
        F.col(f"m.{master_key}").alias("matched_key"),
        F.col(f"m.{master_name}").alias("matched_name"),
        dist.alias("distance"))
    if max_distance is not None:
        scored = scored.filter(F.col("distance") <= max_distance)
    w = Window.partitionBy("dirty_key").orderBy("distance", "matched_key")
    best = (scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1).drop("_r"))
    return (dirty.select(F.col(dirty_key).alias("dirty_key"))
            .join(best, "dirty_key", "left")
            .orderBy("dirty_key"))


# ------------------------------------------------- time-weighted avg --------

def time_weighted_avg(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      tie_col: str = "event_id") -> DataFrame:
    """Per-key time-weighted average of an irregularly-sampled measure
    (each observation holds until the key's next event — the step
    interpolation TWAP/billing/telemetry pipelines define).

    Exact integer arithmetic end-to-end: the 2-decimal measure becomes
    cents (long), durations are integer microseconds, per-row products
    stay in 64-bit codegen, and the per-key accumulation is
    DECIMAL(38,0) so no span/scale can overflow it. The emitted average
    is integer milli-units: ``(10 * Σ cents·dur) DIV Σ dur`` — floor
    division of non-negative exact integers, bit-identical in any
    engine (no float, no decimal-division scale rules).

    One shuffle total: the lead window partitions by key and the
    grouped agg reuses the same hash partitioning (exchange reuse).
    Keys with no positive-duration interval (single event, or all
    timestamps tied) are dropped. Returns
    (key, n_intervals, total_dur_us, twap_milli).
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    stepped = (events.select(
        F.col(key_col), F.col(ts_col), F.col(tie_col),
        F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
        us.alias("_us"))
        .withColumn("_dur", F.lead("_us").over(w) - F.col("_us"))
        .filter(F.col("_dur").isNotNull()))
    return (stepped.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.sum("_dur").alias("total_dur_us"),
                 F.sum((F.col("_cents") * F.col("_dur"))
                       .cast("decimal(38,0)")).alias("_ws"))
            .filter(F.col("total_dur_us") > 0)
            .select(key_col, "n_intervals", "total_dur_us",
                    F.expr("CAST((_ws * 10) DIV total_dur_us AS BIGINT)")
                    .alias("twap_milli")))


# ------------------------------------------------ co-occurrence lift --------

def cooccurrence_lift(events: DataFrame, key_col: str = "user_id",
                      item_col: str = "event_type",
                      method: str = "array") -> DataFrame:
    """Market-basket association: for every unordered item pair, how
    much more often the two items share a key's basket than
    independence predicts (lift), plus support and a→b confidence.

    ``method='array'`` (default): baskets collect to a sorted per-key
    item array (one shuffle), pairs explode from 2-combinations of the
    array IN the row (narrow, higher-order functions, no join), then one
    small pair-count shuffle. Right whenever per-key item cardinality is
    bounded (event types, product categories). ``method='join'``: the
    co-partitioned self-join formulation — per-key state is O(1), use it
    when single keys can hold unboundedly many distinct items. Both are
    result-identical. Per-item counts are a tiny side aggregate
    broadcast back; ratios are exact integer milli-units via floor
    division, with numerators through DECIMAL(38,0) so |keys| x |pairs|
    can't overflow 64 bits at any scale.

    NULL-key contract (matches the ANSI-SQL formulation, which is the
    oracle spec): a NULL ``key_col`` basket contributes its rows to the
    per-item counts but to neither ``n_keys`` (COUNT(DISTINCT k)
    excludes NULL) nor any pair (equi-join on k drops NULL) — standard
    SQL semantics in both engines. Pre-filter NULL keys upstream if a
    different policy is wanted.
    """
    # NO persist (measured 1.30s -> 0.62s at sf0.1): all three consumers
    # (key count, item counts, pairs) reach the distinct through the same
    # exchange, which ReusedExchange deduplicates — a cache only added
    # block-manager overhead. |keys| rides the plan as a broadcast 1-row
    # aggregate instead of a blocking driver count().
    baskets = (events.select(F.col(key_col).alias("k"),
                             F.col(item_col).alias("item"))
               .distinct())
    n_keys_df = baskets.agg(
        F.count_distinct(F.col("k")).cast("long").alias("_n"))

    item_counts = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    if method == "array":
        arr = baskets.groupBy("k").agg(
            F.array_sort(F.collect_set("item")).alias("_items"))
        combos = F.flatten(F.transform(
            "_items",
            lambda x, i: F.transform(
                F.slice("_items", i + 2,
                        F.size(F.col("_items"))),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")))))
        pair_counts = (arr.select(F.explode(combos).alias("_p"))
                       .select("_p.item_a", "_p.item_b")
                       .groupBy("item_a", "item_b")
                       .agg(F.count(F.lit(1)).alias("n_both")))
    elif method == "join":
        a = baskets.select(F.col("k"), F.col("item").alias("item_a"))
        b = baskets.select(F.col("k").alias("k2"),
                           F.col("item").alias("item_b"))
        pair_counts = (a.join(b, (a["k"] == b["k2"])
                              & (F.col("item_a") < F.col("item_b")))
                       .groupBy("item_a", "item_b")
                       .agg(F.count(F.lit(1)).alias("n_both")))
    else:
        raise ValueError(f"unknown method {method!r}")

    ia = item_counts.select(F.col("item").alias("item_a"),
                            F.col("cnt").alias("n_a"))
    ib = item_counts.select(F.col("item").alias("item_b"),
                            F.col("cnt").alias("n_b"))
    return (pair_counts
            .join(F.broadcast(ia), "item_a").join(F.broadcast(ib), "item_b")
            .crossJoin(F.broadcast(n_keys_df))
            .select(
                "item_a", "item_b", "n_both", "n_a", "n_b",
                F.expr("CAST((n_both * 1000) DIV _n AS BIGINT)")
                .alias("support_milli"),
                F.expr("CAST((n_both * 1000) DIV n_a AS BIGINT)")
                .alias("confidence_milli"),
                F.expr("CAST((CAST(n_both AS DECIMAL(38,0)) * _n * 1000)"
                       " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
                .alias("lift_milli")))


def distribution_drift(items: DataFrame, item_col: str,
                       flag_col: str) -> DataFrame:
    """Per-item distribution drift between two sides of a corpus.

    ``items``: one row per occurrence; ``flag_col`` boolean marks side A
    (e.g. the train split) vs side B. For every distinct item the
    smoothed occurrence probabilities p (side A) and q (side B) are
    compared with the chi-square-style statistic
    ``drift = (p - q)^2 / (p + q)`` — the additive term of the
    triangular discrimination divergence. Deliberately NOT KL: the
    statistic is pure ``+ - * /`` on exact integer counts, so every
    double is exactly-rounded IEEE and the output hash-matches across
    engines with no transcendental-libm or quantization caveats
    (ARCHITECTURE.md round-3 notes; same dividing line as BM25).

    Add-one smoothing over the joint vocabulary keeps items observed on
    one side only finite and comparable. One shuffle (the item count);
    the three totals ride a broadcast 1-row aggregate back in-plan.
    """
    f = F.col(flag_col).cast("long")
    agg = (items.groupBy(F.col(item_col).alias("item"))
           .agg(F.sum(f).cast("bigint").alias("cnt_a"),
                F.sum(F.lit(1) - f).cast("bigint").alias("cnt_b")))
    tot = agg.agg(F.sum("cnt_a").cast("bigint").alias("_na"),
                  F.sum("cnt_b").cast("bigint").alias("_nb"),
                  F.count(F.lit(1)).cast("bigint").alias("_v"))
    p = ((F.col("cnt_a") + 1).cast("double")
         / (F.col("_na") + F.col("_v")).cast("double"))
    q = ((F.col("cnt_b") + 1).cast("double")
         / (F.col("_nb") + F.col("_v")).cast("double"))
    return (agg.crossJoin(F.broadcast(tot))
            .select("item", "cnt_a", "cnt_b",
                    ((p - q) * (p - q) / (p + q)).alias("drift")))


def _cms_cells(item_col: str, width: int, depth: int,
               portable: bool) -> Column:
    """The (row, bucket) cell array for one item — ONE definition shared
    by sketch build and point query: the two must agree bit-for-bit on
    the salt format and hash family, or estimates silently probe the
    wrong buckets."""
    def h(row: int):
        c = F.concat_ws("|", F.col(item_col).cast("string"),
                        F.lit(f"cms{row}"))
        base = portable_hash60(c) if portable else \
            F.xxhash64(c).bitwiseAND(F.lit((1 << 60) - 1))
        return (base % width).cast("int")

    return F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"), h(r).alias("bucket"))
        for r in range(depth)])).alias("c")


def countmin_sketch(items: DataFrame, item_col: str,
                    width: int = 512, depth: int = 4,
                    portable: bool = True) -> DataFrame:
    """Count-Min frequency sketch (Cormode & Muthukrishnan, J.Alg 2005).

    One grouped count builds the whole sketch: every occurrence maps to
    ``depth`` (row, bucket) cells via independent salted hashes, and the
    sketch is the (depth x width) cell-count table — bounded state for
    an unbounded item domain, and MERGEABLE (union = cell-wise sum), so
    per-partition/per-day sketches combine without rescanning. Query an
    item's estimate as min over its depth cells; overestimates only.

    Deterministic: salted hashes of the value, so two engines (or two
    cluster layouts) build bit-identical sketches — ``portable=True``
    uses the md5-60bit family a SQL oracle mirrors.

    Returns (row, bucket, cnt) — the sketch relation itself.
    """
    return (items.select(_cms_cells(item_col, width, depth, portable))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))


def countmin_estimate(sketch: DataFrame, probes: DataFrame, item_col: str,
                      width: int = 512, depth: int = 4,
                      portable: bool = True) -> DataFrame:
    """Point-query the Count-Min sketch for each probe item: the
    estimate is MIN over the item's depth cells (broadcast of the
    bounded sketch, no shuffle of the probe side). Guaranteed
    >= true count; the overestimate bound is eps*N with
    eps = e/width at confidence 1 - (1/e)^depth.

    LEFT join + coalesce(0): an empty cell means count 0, which must
    win the MIN — an inner join would drop never-seen probe items from
    the output entirely and inflate partially-collided ones.
    """
    probe_cells = probes.select(
        item_col, _cms_cells(item_col, width, depth, portable)).select(
        item_col, F.col("c.row").alias("row"),
        F.col("c.bucket").alias("bucket"))
    return (probe_cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
            .groupBy(item_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("bigint").alias("cms_est")))


# ------------------------------------------------------- grouped OLS --------

def grouped_ols(df: DataFrame, x_col, y_col, by: list[str],
                scale: int = 100) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope / intercept / r2)
    from EXACT sufficient statistics: x and y are fixed-point money/
    quantity doubles, so ``round(v * scale)`` recovers exact integers
    and the five sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in
    DECIMAL(38,0) — bit-identical in any engine, map-side combinable,
    ONE shuffle on the group key. The closed forms
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` etc. then run in IEEE
    double over identical inputs with an identical expression tree, so
    the outputs hash-match cross-engine (rounded to absorb any
    reassociation ulp). The 100 TB story: a regression over trillions
    of rows costs exactly one grouped aggregate — no second pass, no
    centering pass.
    """
    xs = F.round(F.col(x_col) * scale).cast("long")
    ys = F.round(F.col(y_col) * scale).cast("long")
    d = F.lit(float(scale))
    agg = (df.groupBy(*by)
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(xs.cast("decimal(38,0)")).alias("_sx"),
                F.sum(ys.cast("decimal(38,0)")).alias("_sy"),
                F.sum((xs.cast("decimal(19,0)") * ys.cast("decimal(19,0)"))
                      .cast("decimal(38,0)")).alias("_sxy"),
                F.sum((xs.cast("decimal(19,0)") * xs.cast("decimal(19,0)"))
                      .cast("decimal(38,0)")).alias("_sxx"),
                F.sum((ys.cast("decimal(19,0)") * ys.cast("decimal(19,0)"))
                      .cast("decimal(38,0)")).alias("_syy")))
    n = F.col("n").cast("double")
    sx = (F.col("_sx").cast("double") / d)
    sy = (F.col("_sy").cast("double") / d)
    sxy = (F.col("_sxy").cast("double") / (d * d))
    sxx = (F.col("_sxx").cast("double") / (d * d))
    syy = (F.col("_syy").cast("double") / (d * d))
    cov_n = n * sxy - sx * sy          # n^2 * covariance
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return (agg.select(*by, "n",
                       F.round(slope, 9).alias("slope"),
                       F.round((sy - slope * sx) / n, 9).alias("intercept"),
                       F.round(cov_n * cov_n / (var_x * var_y), 9)
                       .alias("r2")))
