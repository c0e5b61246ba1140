"""As-of (time-travel) join — an operator Spark lacks natively.

For each left row (key, ts) find the right row with the same key that is
nearest in time under a direction rule:

- ``backward`` (default): latest right with right.ts <= left.ts
- ``forward``: earliest right with right.ts >= left.ts
- ``nearest``: whichever of the two is closer (ties -> backward)

Implemented as the union-sort trick rather than a range join: tag both
sides, sort within key by (ts, side) and carry the adjacent right row
across with an unbounded ``last/first(ignorenulls)`` window — ONE
shuffle on the key, no range explosion, no skewed inequality join (a
range join re-scans right rows per left row; the union-sort is linear
in |left|+|right|). ``nearest`` runs both directional windows over the
SAME sorted partition, so it still costs one shuffle + one sort.

The right row travels as ONE struct, so every payload column comes from
the same matched row (ASOF semantics: the nearest row's NULL payload
stays NULL — per-column ignorenulls windows would instead skip back to
an older non-null value, silently mixing rows).

At 100 TB both sides arrive partitioned by key; the union preserves
that, so the window sort is per-key and spill-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: tuple[str, ...] = (),
              prefix: str = "asof_",
              direction: str = "backward") -> DataFrame:
    """Left as-of join. Right payload columns are emitted as
    ``{prefix}{col}`` (NULL when no matching right row exists in the
    chosen direction). Both directional bounds are INCLUSIVE; ``nearest``
    breaks exact-distance ties backward."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    out_payload = [f"{prefix}{p}" for p in payload]

    # side ordering controls inclusivity at equal timestamps:
    #   backward window (frame ...current) must SEE a right row at the
    #   same ts  -> right sorts before left  (side 0 < 1);
    #   forward window (frame current...) must see it too -> right sorts
    #   after left (side 2 > 1). nearest uses side 0: the equal-ts row
    #   resolves through the backward branch with distance 0, which wins
    #   every tie anyway.
    r_side = 2 if direction == "forward" else 0
    l = (left
         .withColumn("_ts", F.col(left_ts))
         .withColumn("_side", F.lit(1)))
    # the matched row travels as one struct (its ts + payload): non-null
    # exactly on right rows, so last/first(ignorenulls) binds the whole
    # row atomically
    r = right.select(
        F.col(key), F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.struct(F.col(right_ts).alias("_m_ts"),
                 *[F.col(p).alias(o) for p, o in zip(payload, out_payload)]
                 ).alias("_m"))
    both = l.unionByName(r, allowMissingColumns=True)

    wb = (Window.partitionBy(key).orderBy("_ts", "_side")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(key).orderBy("_ts", "_side")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))

    if direction == "backward":
        both = both.withColumn("_m", F.last("_m", ignorenulls=True).over(wb))
    elif direction == "forward":
        both = both.withColumn("_m", F.first("_m", ignorenulls=True).over(wf))
    else:  # nearest: both directions over the one sorted partition.
        # Distances compare in the ts column's NATIVE precision
        # (integer micros for timestamps) — a double cast would round
        # independently per value and could flip exact-distance ties.
        ts_type = dict(both.dtypes)["_ts"]
        lin = (F.unix_micros if ts_type.startswith("timestamp")
               else lambda c: c)
        mb = F.last("_m", ignorenulls=True).over(wb)
        mf = F.first("_m", ignorenulls=True).over(wf)
        both = both.withColumn("_mb", mb).withColumn("_mf", mf)
        use_fwd = (F.col("_mf").isNotNull()
                   & (F.col("_mb").isNull()
                      | (lin(F.col("_mf._m_ts")) - lin(F.col("_ts"))
                         < lin(F.col("_ts")) - lin(F.col("_mb._m_ts")))))
        both = (both.withColumn("_m", F.when(use_fwd, F.col("_mf"))
                                .otherwise(F.col("_mb")))
                .drop("_mb", "_mf"))
    return (both.filter(F.col("_side") == 1)
            .select(*left.columns,
                    *[F.col(f"_m.{o}").alias(o) for o in out_payload]))


def temporal_lookup(probe: DataFrame, history: DataFrame, key: str,
                    probe_ts: str,
                    payload: tuple[str, ...] = (),
                    valid_from: str = "_tf_valid_from",
                    valid_to: str = "_tf_valid_to",
                    prefix: str = "ver_") -> DataFrame:
    """SCD2 temporal join: for each probe row, the dimension version
    valid AT its timestamp (``valid_from <= ts < valid_to``, open
    ``valid_to`` = still current) — the query the SCD2 history exists to
    answer, e.g. "the customer's segment when the order was placed".

    Versions of one key are non-overlapping, so the covering version is
    exactly the as-of (backward) match on ``valid_from`` — ONE shuffle
    via the union-sort join, no interval range join. A probe falling in
    a validity gap (key deleted at that time) gets NULLs, same as an
    unmatched interval join. Payload columns come out as
    ``{prefix}{col}``; both sides must share the ``key`` column name
    (rename upstream for role-playing dims, reference 34:61-65).
    """
    vt = f"{prefix}{valid_to}"
    j = asof_join(probe, history, key=key, left_ts=probe_ts,
                  right_ts=valid_from, payload=(*payload, valid_to),
                  prefix=prefix, direction="backward")
    # the as-of match is the latest version STARTED at or before ts;
    # it only covers ts if it had not ended yet
    alive = F.col(vt).isNull() | (F.col(probe_ts) < F.col(vt))
    out_cols = [f"{prefix}{p}" for p in payload]
    for o in out_cols:
        j = j.withColumn(o, F.when(alive, F.col(o)))
    return j.drop(vt)
