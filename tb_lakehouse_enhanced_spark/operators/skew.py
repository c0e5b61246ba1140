"""Skew mitigation: salted two-phase aggregation.

When a groupBy key has few distinct values (or a hot key), the final
shuffle funnels everything into a handful of reducers regardless of
cluster size. Salting splits each group into ``n`` sub-groups for the
partial aggregate — spreading the map-side combine across n*|groups|
reducers — then a second (tiny) aggregate folds the salts away. Only
associative aggregates (sum/count/min/max) are eligible; decimal sums
keep exactness, so results are bit-identical to the direct plan.

(For skewed JOINs AQE's skew-join splitting already handles it —
enabled in session.py; this helper covers skewed AGGREGATES, which AQE
does not rebalance.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(df: DataFrame, group_cols: list[str], salt_expr: Column,
               sums: dict[str, Column], counts: tuple[str, ...] = (),
               n_salts: int = 16) -> DataFrame:
    """groupBy(group_cols).agg(sum..., count...) computed via a salted
    partial phase. ``salt_expr`` must be deterministic and high-cardinality
    within groups (e.g. a key column — never rand(), which breaks retry
    determinism)."""
    salted = df.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salts)))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[F.sum(expr).alias(f"_p_{name}") for name, expr in sums.items()],
        *([F.count(F.lit(1)).alias("_p_cnt")] if counts else []))
    final_aggs = [F.sum(f"_p_{name}").alias(name) for name in sums]
    final_aggs += [F.sum("_p_cnt").alias(c) for c in counts]
    return partial.groupBy(*group_cols).agg(*final_aggs)
