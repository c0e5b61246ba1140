"""Change-data-feed: row-level diff between two table snapshots.

The reference's lakehouse (Databricks Delta) exposes CDF via
``table_changes()`` — downstream consumers read inserts/updates/deletes
instead of re-scanning the full table (the incremental-consumption half
of SURVEY.md §2.8's maintenance surface). ``delta-spark`` is absent
here, so the same observable feed is computed from two snapshots as ONE
full-outer join on the natural key — a single shuffle, narrow branch
projections, the exact pattern ``operators/merge.py`` uses — emitting
Delta's four change types: ``insert``, ``delete``,
``update_preimage``, ``update_postimage``.

At scale the join shuffles both snapshots once on the key; with the
table partitioned/bucketed on the key the exchange is elided entirely.
Keyless mode (no natural key) falls back to a multiset diff
(two hash anti-joins via ``exceptAll``): inserts + deletes only, which
is all that is well-defined without row identity.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_TYPE = "_change_type"


def changes_between(before: DataFrame | None, after: DataFrame,
                    keys: tuple[str, ...] | list[str] | None = None) -> DataFrame:
    """Rows that changed from ``before`` to ``after``, Delta-CDF-shaped.

    Returns the business columns of ``after`` plus ``_change_type``.
    With ``keys``: insert / delete / update_preimage / update_postimage
    (unchanged rows are filtered out null-safely). Without ``keys``:
    insert / delete by multiset difference.
    """
    if before is None:
        return after.withColumn(CHANGE_TYPE, F.lit("insert"))
    cols = list(after.columns)
    if not keys:
        ins = after.exceptAll(before).withColumn(CHANGE_TYPE, F.lit("insert"))
        dels = before.exceptAll(after).withColumn(CHANGE_TYPE, F.lit("delete"))
        return ins.unionByName(dels)

    keys = list(keys)
    tracked = [c for c in cols if c not in keys]
    t = before.withColumn("_b", F.lit(True)).alias("t")
    s = after.withColumn("_a", F.lit(True)).alias("s")
    on = reduce(lambda a, b: a & b,
                (F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys))
    j = t.join(s, on, "full_outer")

    matched = F.col("t._b").isNotNull() & F.col("s._a").isNotNull()
    changed = matched & reduce(
        lambda a, b: a | b,
        (~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}")) for c in tracked),
        F.lit(False))
    inserted = F.col("t._b").isNull()
    deleted = F.col("s._a").isNull()

    # one pass over the join: each joined row emits 0-2 change rows via an
    # exploded case-array, instead of four filter branches that would
    # re-execute the join subtree once per change type
    def img(prefix: str, change: str):
        return F.struct(*[F.col(f"{prefix}.{c}").alias(c) for c in cols],
                        F.lit(change).alias(CHANGE_TYPE))

    change_rows = (F.when(inserted, F.array(img("s", "insert")))
                   .when(deleted, F.array(img("t", "delete")))
                   .when(changed, F.array(img("t", "update_preimage"),
                                          img("s", "update_postimage")))
                   .otherwise(F.array()))
    return (j.select(F.explode(change_rows).alias("_c"))
            .select("_c.*"))


def apply_changes(target: DataFrame | None, changes: DataFrame,
                  keys: tuple[str, ...] | list[str]) -> DataFrame:
    """Apply a CDF batch to a target state (the consumer half of CDC).

    ``changes`` is ``changes_between`` output (or Delta ``table_changes``):
    inserts and update postimages replace/extend the target, deletes drop
    their keys, preimages are ignored. ONE shuffle join: the target left-joins
    the distinct changed-key set, rows untouched by the batch pass through,
    and the upsert images are unioned on. Incremental cost is proportional
    to |changes|, not |target| — the point of consuming CDF instead of
    re-scanning the source at 100 TB. (The target-side scan prunes to the
    joined partitions when the table is partitioned/bucketed on the key.)
    """
    keys = list(keys)
    cols = [c for c in changes.columns
            if c not in (CHANGE_TYPE, "_commit_version")]
    upserts = (changes.filter(F.col(CHANGE_TYPE).isin("insert", "update_postimage"))
               .select(cols))
    if target is None:
        return upserts
    touched = (changes.filter(F.col(CHANGE_TYPE) != "update_preimage")
               .select(keys).dropDuplicates(keys)
               .withColumn("_touched", F.lit(True)))
    kept = (target.join(touched, keys, "left_outer")
            .filter(F.col("_touched").isNull())
            .drop("_touched"))
    return kept.select(cols).unionByName(upserts)


def incremental_agg_update(state: DataFrame | None, changes: DataFrame,
                           group_cols: list[str] | tuple[str, ...],
                           sum_cols: dict[str, str],
                           count_col: str = "n_rows") -> DataFrame:
    """Incremental view maintenance for SUM/COUNT aggregates.

    ``state`` is a materialized ``GROUP BY group_cols`` aggregate
    (``count_col`` = COUNT(*), one column per ``sum_cols`` entry mapping
    input column -> state column, summed in DECIMAL). ``changes`` is a
    CDF batch (``changes_between`` / Delta ``table_changes``). The new
    state is computed WITHOUT rescanning the base table:

    - each change row carries a sign (+1 insert/update_postimage,
      -1 delete/update_preimage), so per-group deltas are one
      aggregation over |changes| rows;
    - deltas full-outer-join the state on the group key (one shuffle,
      proportional to |changed groups|, not |groups|);
    - groups whose maintained count reaches 0 are dropped — SUM/COUNT
      are self-inverse under signed deltas, which is why this works
      with no per-group rescan (MIN/MAX are not: a deleted extremum
      needs a rescan of that group, the classic IVM limitation).

    This is the gold-layer answer to "the dashboard aggregate must not
    re-read 100 TB because 0.1% of rows changed": cost scales with the
    change feed, and the state join prunes to touched partitions when
    the materialized aggregate is partitioned on the group key.
    """
    group_cols = list(group_cols)
    sign = (F.when(F.col(CHANGE_TYPE).isin("delete", "update_preimage"), F.lit(-1))
            .otherwise(F.lit(1)))
    delta_aggs = [F.sum(sign).alias(f"_d_{count_col}")]
    for src_col, out_col in sum_cols.items():
        delta_aggs.append(
            F.sum(sign * F.col(src_col).cast("decimal(28,6)")).alias(f"_d_{out_col}"))
    deltas = changes.groupBy(*group_cols).agg(*delta_aggs)

    if state is None:
        zero = F.lit(0).cast("decimal(28,6)")
        return (deltas.filter(F.col(f"_d_{count_col}") > 0)
                .select(*group_cols,
                        F.col(f"_d_{count_col}").alias(count_col),
                        *[(zero + F.col(f"_d_{o}")).cast("decimal(28,6)").alias(o)
                          for o in sum_cols.values()]))

    s = state.alias("s")
    d = deltas.alias("d")
    joined = s.join(d, group_cols, "full_outer")
    new_count = (F.coalesce(F.col(f"s.{count_col}"), F.lit(0))
                 + F.coalesce(F.col(f"d._d_{count_col}"), F.lit(0)))
    zero = F.lit(0).cast("decimal(28,6)")
    out_sums = [
        (F.coalesce(F.col(f"s.{o}"), zero)
         + F.coalesce(F.col(f"d._d_{o}"), zero)).cast("decimal(28,6)").alias(o)
        for o in sum_cols.values()]
    return (joined.select(*group_cols, new_count.alias(count_col), *out_sums)
            .filter(F.col(count_col) > 0))


def sync_incremental(src, dst, keys: tuple[str, ...]) -> int:
    """Propagate ``src``'s changes since the last sync into ``dst``
    (both :class:`~..sources.managed.ManagedTable`) — O(changes) on
    BOTH sides.

    Read side: the commit-log-driven per-commit feed
    (``table_changes(mark+1, cur)``, cost ~ the changed files, never
    the source table). Write side, by replica layout:

    - ``dst`` partitioned: ONE partition-scoped merge commit — only
      the partitions the feed touches are rewritten, the rest
      hardlink forward. Touched partitions derive from EVERY feed row
      *including update preimages*, so a key that moved partitions
      (even across several commits in the range) has its old location
      rewritten too — no stale duplicate, no dst-wide scan.
    - ``dst`` unpartitioned: the batch lands MERGE-ON-READ — deletes
      as a tombstone key file (``delete_mor_keys``, zero dst files
      read), upserts as a delta file (``upsert_mor``) — and ``read``
      resolves last-writer-wins. Run ``dst.maintain()`` on a cadence
      to fold the accumulated MOR debt, exactly Delta's
      streaming-apply + OPTIMIZE rhythm.

    The high-water mark (the src version last applied) rides in the
    sync commit's own metadata, so the sync is restart-safe AND
    atomic with the data: re-running after a crash re-reads the mark
    from the last durable commit and re-applies idempotently (MOR
    re-application stacks an identical batch — last-writer-wins
    resolves to the same state). First sync = full copy. Returns the
    src version dst is now synced to.
    """
    cur = src.current_version()
    mark = next((h.get("synced_to") for h in dst.history()
                 if h.get("synced_to") is not None), None) if dst.exists() else None
    if mark is None:
        dst.overwrite(src.read(), operation=f"CDC_SYNC v{cur}",
                      extra_meta={"synced_to": cur})
        return cur
    if mark == cur:
        return cur
    # collapse the feed to each key's LAST change — a key touched by
    # several commits would otherwise contribute conflicting images.
    # The final state per key IS its newest change (delete drops,
    # image upserts), so the collapse is exact.
    from pyspark.sql import Window
    ch = src.table_changes(mark + 1, cur, keys=keys)
    w = Window.partitionBy(*keys).orderBy(F.desc("_commit_version"))
    last = (ch.filter(F.col(CHANGE_TYPE) != "update_preimage")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn", "_commit_version"))
    op, meta = f"CDC_SYNC v{cur}", {"synced_to": cur}

    if dst.partition_by:
        klist = list(keys)

        def combine(t_slice, _feed):
            cols = t_slice.columns
            touched_keys = last.select(klist).dropDuplicates(klist)
            kept = t_slice.join(touched_keys, klist, "left_anti")
            ups = (last.filter(F.col(CHANGE_TYPE).isin(
                "insert", "update_postimage")).select(cols))
            return kept.unionByName(ups)

        # the partition-derivation source is the UNCOLLAPSED feed WITH
        # preimages: every old location of a moved key is touched
        dst.merge_into_generic(
            ch, combine, operation=op, keys=klist,
            stable_partitions=True, extra_meta=meta)
        return cur

    last = last.persist()
    try:
        cols = [c for c in last.columns if c != CHANGE_TYPE]
        dels = last.filter(F.col(CHANGE_TYPE) == "delete").select(*keys)
        ups = (last.filter(F.col(CHANGE_TYPE).isin(
            "insert", "update_postimage")).select(cols))
        has_dels, has_ups = not dels.isEmpty(), not ups.isEmpty()
        if has_dels and has_ups:
            # deletes first: their tombstone sequence stays OLDER than
            # the delta's, so the (disjoint) upserted keys can never be
            # shadowed on a replay
            dst.delete_mor_keys(dels, keys)
            dst.upsert_mor(ups, key_cols=keys, extra_meta=meta)
        elif has_dels:
            dst.delete_mor_keys(dels, keys, extra_meta=meta)
        elif has_ups:
            dst.upsert_mor(ups, key_cols=keys, extra_meta=meta)
        # an all-no-op range commits nothing; the mark stays behind and
        # the next sync re-reads the (zero-file) feed — cheap by design
    finally:
        last.unpersist()
    return cur
