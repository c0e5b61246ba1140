"""SCD2 / SCD1 / keyed-upsert merge semantics as DataFrame transformations.

This is the reference's core capability (SURVEY.md §2.9): every silver
table is loaded through a two-pass Delta ``MERGE`` implementing SCD Type 2
history (reference notebooks/22_ETL_Silver_PySpark.py:62-330), the gold
dims through an SCD Type 1 upsert (33_ETL_Gold_Dim_PySpark.py:61-184) and
the fact through a keyed upsert (34_ETL_Gold_Fact_PySpark.py:90-139).

Spark-first design
------------------
Instead of translating the two MERGE transactions literally, each merge is
computed as ONE full-outer join of the *current* target slice with the
source batch, keyed on the natural key — a single shuffle — followed by
narrow per-branch projections and a union:

    matched & changed   -> closed old version (+ new version from source)
    matched & unchanged -> passthrough
    target-only         -> closed (source is a full snapshot: key deleted)
    source-only         -> brand-new version

This is exactly the join Delta's ``MergeIntoCommand`` runs internally
(SURVEY.md §3 E2), minus the transaction log. History rows
(``_tf_valid_to IS NOT NULL``) never enter the join — at scale, with the
table partitioned on an ``is_current`` flag or date, the scan prunes to
the current slice and the rewrite touches only current partitions.

Determinism: the reference stamps rows with ``current_timestamp()``
(22:76-77), which is untestable; every function here takes an injected
``load_ts`` (SURVEY.md §7.4).

Null-safety: the reference's change detection is an OR-chain of
``tgt.c != src.c`` which silently misses NULL<->value transitions
(22:66-75). Default here is the null-safe ``NOT (tgt.c <=> src.c)``;
``strict_reference_semantics=True`` replicates the reference literally
(documented deviation, SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

VALID_FROM = "_tf_valid_from"
VALID_TO = "_tf_valid_to"
CREATE_DATE = "_tf_create_date"
UPDATE_DATE = "_tf_update_date"
TECH_COLS = (VALID_FROM, VALID_TO, CREATE_DATE, UPDATE_DATE)


@dataclass(frozen=True)
class ScdConfig:
    """Parameterization of one merge target (table, keys, tracked cols)."""
    keys: tuple[str, ...]
    tracked: tuple[str, ...]
    surrogate_key: str | None = None          # e.g. "_tf_id"
    strict_reference_semantics: bool = False  # replicate null-unsafe !=
    # range-shuffle width for surrogate assignment: dimensions are small
    # by definition, and a dim-sized batch sorts ~2x faster on a few
    # partitions than on 32 near-empty ones (measured in sequence.py);
    # None = defaultParallelism (the scale-safe fact-sized default)
    surrogate_partitions: int | None = None
    # key matching: True = null-safe (<=>) so NULL natural keys match
    # their own version rows; False = plain equality — the reference's
    # literal `MERGE ON tgt.k = src.k` semantics AND the scale fast
    # path: null-safe comparison wraps the join keys, so the child's
    # hashpartitioning(keys) no longer satisfies the join's required
    # distribution and BOTH sides re-shuffle (measured 8 exchanges vs 4,
    # 3.6s vs 1.6s on the sf0.1 fact grain). Use False whenever keys
    # are NOT NULL — true for every table in the reference's DDL.
    null_safe_keys: bool = True
    extra: dict = field(default_factory=dict)


def align_schemas(target: DataFrame, source: DataFrame,
                  exclude: tuple[str, ...] = ()) -> tuple[DataFrame, DataFrame]:
    """Additive schema evolution (Delta ``mergeSchema`` semantics).

    Columns present in ``source`` but not ``target`` are added to the
    target as typed NULLs (historical rows read back NULL for the new
    attribute, exactly as Delta backfills); columns the source stopped
    shipping are added to the source as typed NULLs so a shrunken feed
    still merges (the value then reads as "attribute became NULL" under
    snapshot semantics). Metadata-only at the DataFrame level — no data
    rewrite happens until the merged state is written.
    """
    t_fields = {f.name: f.dataType for f in target.schema.fields}
    s_fields = {f.name: f.dataType for f in source.schema.fields}
    for name, dtype in s_fields.items():
        if name not in t_fields:
            target = target.withColumn(name, F.lit(None).cast(dtype))
    skip = set(TECH_COLS) | set(exclude)
    for name, dtype in t_fields.items():
        if name not in s_fields and name not in skip:
            source = source.withColumn(name, F.lit(None).cast(dtype))
    return target, source


def _evolve(target: DataFrame, source: DataFrame,
            cfg: ScdConfig) -> tuple[DataFrame, DataFrame, ScdConfig]:
    """Align schemas and pull evolved source columns into the tracked set
    (a newly-shipped attribute is a change worth a new version — without
    this, a row whose only difference is the new column would silently
    keep its old version and never surface the attribute)."""
    from dataclasses import replace
    evolved = [f.name for f in source.schema.fields
               if f.name not in target.columns]
    target, source = align_schemas(
        target, source,
        exclude=(cfg.surrogate_key,) if cfg.surrogate_key else ())
    new_tracked = [c for c in evolved
                   if c not in cfg.tracked and c not in cfg.keys]
    if new_tracked:
        cfg = replace(cfg, tracked=cfg.tracked + tuple(new_tracked))
    return target, source, cfg


def _changed_predicate(cfg: ScdConfig, t: str = "t", s: str = "s") -> Column:
    """OR-chain over tracked columns (reference 22:66-75 / 33:65-72)."""
    def one(c: str) -> Column:
        if cfg.strict_reference_semantics:
            return F.col(f"{t}.{c}") != F.col(f"{s}.{c}")
        return ~F.col(f"{t}.{c}").eqNullSafe(F.col(f"{s}.{c}"))
    return reduce(lambda a, b: a | b, (one(c) for c in cfg.tracked))


def _with_surrogates(inserts: DataFrame, cfg: ScdConfig, offset_df: DataFrame | None) -> DataFrame:
    """Assign contiguous surrogate keys past the current max.

    Emulates ``GENERATED ... AS IDENTITY`` (reference 01_Init.py:59).
    Deterministic: the dense rank of the natural key, computed with the
    two-phase range-partitioned sequence (operators/sequence.py) so the
    insert batch never funnels through a single-task global window.
    """
    if cfg.surrogate_key is None:
        return inserts
    sk = cfg.surrogate_key
    from .sequence import dense_sequence
    if offset_df is None:
        return dense_sequence(inserts, list(cfg.keys), sk, offset=0,
                              num_partitions=cfg.surrogate_partitions)
    # the current max key rides inside dense_sequence's own offsets
    # broadcast (1-row cross join pre-broadcast): no driver collect, no
    # separate broadcast-build job, no extra join in the output plan
    off = offset_df.agg(F.coalesce(F.max(sk), F.lit(0)).cast("bigint")
                        .alias("_sk_off"))
    return dense_sequence(inserts, list(cfg.keys), sk, offset_df=off,
                          num_partitions=cfg.surrogate_partitions)


def _key_eq(k: str, cfg: ScdConfig):
    """One key term of the merge ON condition (see ScdConfig.null_safe_keys)."""
    t, s = F.col(f"t.{k}"), F.col(f"s.{k}")
    return t.eqNullSafe(s) if cfg.null_safe_keys else (t == s)


def scd2_merge(target: DataFrame | None, source: DataFrame, cfg: ScdConfig,
               load_ts, evolve_schema: bool = False) -> DataFrame:
    """Return the post-merge SCD2 table state (two reference passes fused).

    ``target`` carries the source's business columns plus TECH_COLS (and
    optionally ``cfg.surrogate_key``); ``source`` carries business columns
    only. ``source`` is a full snapshot: keys absent from it are treated
    as deleted and their current version is closed
    (``WHEN NOT MATCHED BY SOURCE`` in the reference, 22:78-82).
    """
    load_ts = F.lit(load_ts).cast("timestamp")
    if evolve_schema and target is not None and target.columns:
        target, source, cfg = _evolve(target, source, cfg)
    business = list(source.columns)

    if target is None or not target.columns:
        inserts = (source
                   .withColumn(VALID_FROM, load_ts)
                   .withColumn(VALID_TO, F.lit(None).cast("timestamp"))
                   .withColumn(CREATE_DATE, load_ts)
                   .withColumn(UPDATE_DATE, load_ts))
        return _with_surrogates(inserts, cfg, None)

    current = target.filter(F.col(VALID_TO).isNull())
    history = target.filter(F.col(VALID_TO).isNotNull())

    t = current.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    on = reduce(lambda a, b: a & b,
                (_key_eq(k, cfg) for k in cfg.keys))
    j = t.join(s, on, "full_outer")

    matched = F.col("t._t_present").isNotNull() & F.col("s._s_present").isNotNull()
    # MERGE semantics: a NULL change-predicate means "no action" — the row
    # must fall through to the unchanged branch, so split on IS TRUE
    # (null-safe) to keep the branches total (SURVEY.md §7.4)
    changed_true = _changed_predicate(cfg).eqNullSafe(F.lit(True))
    changed = matched & changed_true
    deleted = F.col("t._t_present").isNotNull() & F.col("s._s_present").isNull()
    brand_new = F.col("t._t_present").isNull() & F.col("s._s_present").isNotNull()

    close_now = changed | deleted
    out_cols = list(target.columns)

    if cfg.surrogate_key is None:
        # SINGLE pass over the join: each joined row emits 1-2 output
        # rows (existing version, and for changed/new keys the fresh
        # open version) as an in-row struct array inlined back to
        # columns — the join subtree appears ONCE in the plan. The
        # union-of-filtered-branches form re-executes the join per
        # branch with different column pruning (same ReusedExchange
        # failure as scd1_merge; tools/shuffle_audit.py).
        def exist_field(c: str) -> Column:
            if c in (VALID_TO, UPDATE_DATE):
                return (F.when(close_now, load_ts)
                        .otherwise(F.col(f"t.{c}")).alias(c))
            return F.col(f"t.{c}").alias(c)

        def insert_field(c: str) -> Column:
            if c in business:
                return F.col(f"s.{c}").alias(c)
            if c == VALID_TO:
                return F.lit(None).cast("timestamp").alias(c)
            return load_ts.alias(c)  # VALID_FROM / CREATE / UPDATE

        e = F.struct(*[exist_field(c) for c in out_cols])
        i = F.struct(*[insert_field(c) for c in out_cols])
        t_present = F.col("t._t_present").isNotNull()
        insert_too = brand_new | changed
        arr = (F.when(t_present & insert_too, F.array(e, i))
               .when(t_present, F.array(e))
               .otherwise(F.array(i)))
        merged = j.select(F.inline(arr))
        return history.select(out_cols).unionByName(merged.select(out_cols))

    # surrogate path: inserts flow through the dense-sequence
    # assignment, which needs the insert slice as its own relation

    # close pass (M1), fused: closed (changed-or-deleted) and unchanged
    # current rows differ only in the valid_to/update stamps — one CASE
    # per stamp column in a single pass over the join, instead of a
    # filter-per-branch union that re-executes the join subtree per
    # branch (exchanges are reused, but join+filter CPU is paid again)
    existing = j.filter(F.col("t._t_present").isNotNull()).select(
        *[F.when(close_now, load_ts).otherwise(F.col(f"t.{c}")).alias(c)
          if c in (VALID_TO, UPDATE_DATE) else F.col(f"t.{c}").alias(c)
          for c in current.columns])

    # insert pass (M2): new keys + replacement versions for changed keys
    s_cols = [F.col(f"s.{c}").alias(c) for c in business]
    inserts = (j.filter(brand_new | changed).select(s_cols)
               .withColumn(VALID_FROM, load_ts)
               .withColumn(VALID_TO, F.lit(None).cast("timestamp"))
               .withColumn(CREATE_DATE, load_ts)
               .withColumn(UPDATE_DATE, load_ts))
    inserts = _with_surrogates(inserts, cfg, target)

    parts = [history, existing, inserts]
    return reduce(lambda a, b: a.select(out_cols).unionByName(b.select(out_cols)),
                  parts)


def scd1_merge(target: DataFrame | None, source: DataFrame, cfg: ScdConfig,
               load_ts, evolve_schema: bool = False) -> DataFrame:
    """SCD Type 1 upsert (reference 33_ETL_Gold_Dim_PySpark.py:61-184).

    Matched & changed rows take the source attributes and a fresh
    ``_tf_update_date``; unmatched source rows are inserted with surrogate
    keys. Keys absent from the source are retained untouched (the
    reference's SCD1 MERGE has no NOT-MATCHED-BY-SOURCE clause).
    """
    load_ts = F.lit(load_ts).cast("timestamp")
    if evolve_schema and target is not None:
        target, source, cfg = _evolve(target, source, cfg)
    business = list(source.columns)

    if target is None:
        inserts = (source.withColumn(CREATE_DATE, load_ts)
                   .withColumn(UPDATE_DATE, load_ts))
        return _with_surrogates(inserts, cfg, None)

    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    on = reduce(lambda a, b: a & b,
                (_key_eq(k, cfg) for k in cfg.keys))
    j = t.join(s, on, "full_outer")

    matched = F.col("t._t_present").isNotNull() & F.col("s._s_present").isNotNull()
    changed_true = _changed_predicate(cfg).eqNullSafe(F.lit(True))
    changed = matched & changed_true
    t_absent = F.col("t._t_present").isNull()
    out_cols = list(target.columns)

    if cfg.surrogate_key is None:
        # TRUE single pass: every joined row maps to exactly one output
        # row (t-present -> kept/updated, t-absent -> insert), so the
        # whole upsert is ONE projection over the join. The split-and-
        # union formulation below looks equivalent, but its two branches
        # prune DIFFERENT columns beneath the join, so Catalyst plans
        # two non-identical subtrees and ReusedExchange cannot kick in —
        # measured via tools/shuffle_audit.py as 3 extra data-sized
        # exchanges on the fact-upsert scenario.
        take_src = t_absent | changed

        def pick(c: str):
            if c in business:
                return (F.when(take_src, F.col(f"s.{c}"))
                        .otherwise(F.col(f"t.{c}")).alias(c))
            if c == UPDATE_DATE:
                return (F.when(take_src, load_ts)
                        .otherwise(F.col(f"t.{c}")).alias(c))
            if c == CREATE_DATE:
                return (F.when(t_absent, load_ts)
                        .otherwise(F.col(f"t.{c}")).alias(c))
            return F.col(f"t.{c}").alias(c)

        return j.select(*[pick(c) for c in out_cols])

    # surrogate path: inserts need the dense-sequence assignment, which
    # only the t-absent slice enters — two branches are structural here

    # untouched, target-only and updated rows differ only in which side
    # supplies the business columns and the update stamp — one CASE per
    # column in a single pass over the join, instead of three
    # filter-branches each re-executing the join subtree
    def pick(c: str):
        if c in business:
            return F.when(changed, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        if c == UPDATE_DATE:
            return F.when(changed, load_ts).otherwise(F.col(f"t.{c}")).alias(c)
        return F.col(f"t.{c}").alias(c)

    existing = (j.filter(F.col("t._t_present").isNotNull())
                .select(*[pick(c) for c in target.columns]))
    inserts = (j.filter(F.col("t._t_present").isNull())
               .select([F.col(f"s.{c}").alias(c) for c in business])
               .withColumn(CREATE_DATE, load_ts)
               .withColumn(UPDATE_DATE, load_ts))
    inserts = _with_surrogates(inserts, cfg, target)

    parts = [existing, inserts]
    return reduce(lambda a, b: a.select(out_cols).unionByName(b.select(out_cols)),
                  parts)


def keyed_upsert(target: DataFrame | None, source: DataFrame, cfg: ScdConfig,
                 load_ts, evolve_schema: bool = False) -> DataFrame:
    """Fact-table upsert (reference 34_ETL_Gold_Fact_PySpark.py:90-139).

    Identical routing to SCD1 but with no surrogate key: composite-keyed
    rows are replaced when any tracked column changed, inserted when new.
    """
    return scd1_merge(target, source, cfg, load_ts, evolve_schema=evolve_schema)


def keyed_sync(target: DataFrame | None, source: DataFrame, cfg: ScdConfig,
               load_ts) -> DataFrame:
    """Full-sync keyed MERGE: ``keyed_upsert`` plus Delta MERGE's third
    clause, ``WHEN NOT MATCHED BY SOURCE THEN DELETE`` — the source is
    a complete snapshot and target keys absent from it are dropped
    (the hard-sync shape for mirroring an upstream system of record;
    SCD2's delete-as-close is the soft-history sibling).

    Single pass: the deletion is a FILTER on the same full-outer join
    the upsert already performs (s-side absent -> row dropped) — no
    second source scan, no anti-join, and the projection stays the
    one-CASE-per-column form scd1_merge uses, so the whole sync is one
    join + one projection. Surrogate-keyed dims are out of scope
    (deletes would hole the sequence); use keys-only facts/dims.
    """
    if cfg.surrogate_key is not None:
        raise ValueError("keyed_sync supports keys-only tables; "
                         "surrogate-keyed dims route through scd1/scd2")
    load_ts = F.lit(load_ts).cast("timestamp")
    business = list(source.columns)
    if target is None or not target.columns:
        return (source.withColumn(CREATE_DATE, load_ts)
                .withColumn(UPDATE_DATE, load_ts))
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    on = reduce(lambda a, b: a & b, (_key_eq(k, cfg) for k in cfg.keys))
    j = (t.join(s, on, "full_outer")
         .filter(F.col("s._s_present").isNotNull()))  # the DELETE clause
    changed_true = _changed_predicate(cfg).eqNullSafe(F.lit(True))
    t_absent = F.col("t._t_present").isNull()
    take_src = t_absent | (F.col("t._t_present").isNotNull() & changed_true)

    def pick(c: str):
        if c in business:
            return (F.when(take_src, F.col(f"s.{c}"))
                    .otherwise(F.col(f"t.{c}")).alias(c))
        if c == UPDATE_DATE:
            return (F.when(take_src, load_ts)
                    .otherwise(F.col(f"t.{c}")).alias(c))
        if c == CREATE_DATE:
            return (F.when(t_absent, load_ts)
                    .otherwise(F.col(f"t.{c}")).alias(c))
        return F.col(f"t.{c}").alias(c)

    return j.select(*[pick(c) for c in target.columns])
