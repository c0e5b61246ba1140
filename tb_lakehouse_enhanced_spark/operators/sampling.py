"""Deterministic sampling & source-mixing operators (LLM-pipeline
extension, SURVEY.md §2.11).

Corpus assembly for pretraining needs reproducible subsampling: take X%
of each language stratum, up/down-weight sources to a target mixture
("temperature sampling" over domains). ``DataFrame.sample`` is
seed-stable only per partitioning — any upstream change reshuffles what
each row draws — so these operators derive the keep/repeat decision from
a HASH OF THE ROW KEY instead: the sample is a pure function of the
data, reproducible across runs, partitionings, engines, and cluster
sizes, and expressible in ANSI SQL for the correctness oracle.

The hash is the portable 60-bit md5 prefix (operators/dedup.py
``portable_hash60``); its low digits are uniform, so
``hash % 1_000_000 < rate * 1_000_000`` keeps an unbiased ``rate``
fraction of every stratum. No shuffle anywhere — both operators are
narrow per-row transforms that scan-prune and pushdown like any filter;
up-weighting repeats rows via a deterministic explode (no RNG).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash60

_M = 1_000_000


def _draw(key: Column, salt: str) -> Column:
    """Uniform integer in [0, 1e6) as a pure function of (key, salt)."""
    return portable_hash60(F.concat_ws("|", key.cast("string"), F.lit(salt))) % _M


def sample_stratified(df: DataFrame, rates: dict[str, float],
                      stratum_col: str, key_col: str,
                      default_rate: float = 0.0,
                      salt: str = "strat") -> DataFrame:
    """Keep a per-stratum fraction of rows, deterministically.

    ``rates`` maps stratum value -> keep fraction (e.g. ``{"en": 0.5,
    "de": 1.0}``); strata not listed keep ``default_rate``. The decision
    is per-row-key, so re-running on re-partitioned (or incrementally
    grown) data keeps exactly the same rows — the property that makes
    dataset versions diffable at 100 TB.
    """
    thresh = F.lit(int(default_rate * _M))
    for value, rate in sorted(rates.items()):
        thresh = F.when(F.col(stratum_col) == value,
                        F.lit(int(rate * _M))).otherwise(thresh)
    return df.filter(_draw(F.col(key_col), salt) < thresh)


def mix_sources(df: DataFrame, weights: dict[str, float],
                source_col: str, key_col: str,
                salt: str = "mix") -> DataFrame:
    """Temperature-style source mixing: weight < 1 downsamples a source,
    weight > 1 up-weights it by deterministic repetition (epoching).

    A weight of 2.4 emits every row of that source twice and keeps a
    further 40% (by row-key hash) a third time — the standard
    integer+fractional decomposition of mixture weights. Output carries
    an ``epoch`` column (0-based repeat index) so downstream shuffling /
    sharding can spread the repeats.

    Spark shape: ``explode(sequence(0, n_repeats-1))`` — a narrow
    per-row fan-out, no shuffle, no RNG state. At 100 TB this is how you
    express "2.4 epochs of Wikipedia vs 0.3 of CommonCrawl" without a
    driver-side loop over sources.
    """
    int_part = F.lit(0)
    frac_thresh = F.lit(0)
    for value, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {value!r}")
        int_part = F.when(F.col(source_col) == value,
                          F.lit(int(w))).otherwise(int_part)
        frac_thresh = F.when(F.col(source_col) == value,
                             F.lit(int(round((w - int(w)) * _M)))).otherwise(frac_thresh)
    extra = (_draw(F.col(key_col), salt) < frac_thresh).cast("int")
    n = (int_part + extra).alias("_n")
    return (df.withColumn("_n", n)
            .filter(F.col("_n") > 0)
            .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
            .drop("_n"))


def allocate_quotas(df: DataFrame, group_col: str, budget: int) -> DataFrame:
    """Proportional quota allocation with largest-remainder top-up.

    Splits a total row ``budget`` across groups proportionally to their
    sizes, entirely in integer arithmetic (Hamilton's method): each
    group gets ``floor(budget * n_g / N)``, and the leftover seats go to
    the largest remainders ``(budget * n_g) mod N`` (ties broken by
    group value ascending — deterministic in every engine). Quotas sum
    to exactly ``budget`` (or to N when the budget exceeds the
    population) — the allocation step of balanced eval-set construction;
    feed the result to ``skew.topk_per_group`` to draw the actual rows.

    Spark shape: one count aggregate over the groups, a 1-row total
    broadcast back in-plan, and a rank window over the GROUPS relation
    (group-cardinality-sized, never data-sized).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = counts.agg(F.sum("n").cast("bigint").alias("_N"),
                     F.count(F.lit(1)).cast("bigint").alias("_G"))
    b = F.lit(int(budget)).cast("bigint")
    c = (counts.crossJoin(F.broadcast(tot))
         .withColumn("_floor", F.expr(f"({int(budget)} * n) DIV _N"))
         .withColumn("_rem", (b * F.col("n")) % F.col("_N")))
    from pyspark.sql import Window
    # leftover seats = budget - sum(floors) <= G - 1: rank over the
    # group-cardinality relation (tiny by construction)
    w = Window.orderBy(F.desc("_rem"), F.asc("grp"))
    leftover = b - F.sum("_floor").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return (c.withColumn("_rk", F.row_number().over(w))
            .withColumn("quota",
                        F.least(F.col("n"),
                                F.col("_floor")
                                + (F.col("_rk") <= leftover).cast("bigint")))
            .select("grp", "n", "quota"))


def diversity_sample(embeddings: DataFrame, budget: int,
                     n_clusters: int = 16, sample_size: int = 2048,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Embedding-cluster-balanced draw: sample ``budget`` rows whose
    CLUSTER distribution mirrors the corpus — the diversity-aware
    cousin of language/source stratification, for when the strata you
    care about (topics, styles) have no column and live only in the
    embedding geometry.

    Composition of existing machinery, one lazy plan after training:
    k-means centroids from a bounded driver sample
    (similarity._kmeans_centroids — same quantizer IVF uses), one
    Arrow-batched nearest-centroid assignment pass (ivf_assign), exact
    Hamilton quotas per cluster (allocate_quotas), and the
    deterministic hash-ranked per-cluster draw (topk_per_group) —
    exactly ``budget`` rows out (when the corpus has that many),
    reproducible across runs, partitionings and cluster sizes.

    Returns (id, cluster) rows. Training is the only non-relational
    step (iterative), so the registered query is rows-only checked;
    the pytest invariants pin quota exactness and determinism.
    """
    import numpy as np

    from .similarity import _kmeans_centroids, _train_sample_rows, ivf_assign
    from .skew import topk_per_group
    # deterministic hash-bottom-n draw (see _train_sample_rows): the
    # training sample — and hence the centroids and the whole draw —
    # is a pure function of corpus contents, invariant under
    # repartitioning, as the docstring's reproducibility claim needs
    mat = np.array(_train_sample_rows(embeddings, vec_col, sample_size),
                   dtype=np.float64)
    centroids = _kmeans_centroids(mat, n_clusters)
    assigned = (ivf_assign(embeddings, centroids, id_col, vec_col)
                .select(id_col, F.col("ivf_list").alias("cluster")))
    quotas = allocate_quotas(assigned, "cluster", budget).select(
        F.col("grp").alias("cluster"), "quota")
    ranked = topk_per_group(
        assigned.withColumn("_h", F.md5(F.col(id_col).cast("string"))),
        ["cluster"], "_h", k=budget, tie_col=id_col)
    return (ranked.join(F.broadcast(quotas), "cluster")
            .filter(F.col("rank") <= F.col("quota"))
            .select(id_col, "cluster"))
