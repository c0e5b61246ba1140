"""Exact edit-distance similarity join with LOSSLESS segment blocking.

``fuzzy_match`` (operators/analytics.py) resolves entities when the
caller can name blocking columns; this operator needs none: it returns
EXACTLY the pairs within Levenshtein distance ``d`` of each other, at
scale, via the partition-based candidate scheme of the PassJoin family
(Li/Deng/Jiang/Feng, "PASS-JOIN: A Partition-based Method for
Similarity Joins", PVLDB 5(3), 2011 — public literature):

- every LEFT string of length L is split into ``d + 1`` contiguous
  segments (even split, remainder spread over the LAST segments — the
  deterministic layout both sides must agree on);
- by pigeonhole, any RIGHT string within edit distance ``d`` of it
  must contain at least one of those segments EXACTLY, as a substring
  starting within ``±d`` of the segment's home position (at most d
  edits shift any aligned position by at most d);
- so the RIGHT side enumerates, for every candidate left length
  ``L in [len(r) - d, len(r) + d]`` and every segment slot, the
  substrings in that position window — a constant ~(2d+1)^2 * (d+1)
  rows per input row for small ``d`` — and candidates meet in ONE
  equi-join on (left length, slot, segment text, aligned start);
- candidates dedupe per pair and the exact ``levenshtein`` residual
  keeps true matches only.

Nothing here is quadratic: generation is linear with a small constant,
the join is a hash shuffle on segment text (short, well-distributed),
and verification touches candidate pairs only. This is the
exact-at-scale path; the DuckDB oracle for the registered query is the
brute-force all-pairs filter, which the engine must reproduce exactly
(blocking is lossless, not approximate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(str_col, length_col, d: int):
    """Array of (slot, start, seg_len) structs for the deterministic
    ``d + 1``-way split of a string of ``length_col`` chars.

    Even split with the remainder on the LAST ``L mod (d+1)`` segments
    (PassJoin's layout): slot i has length base + 1 if i >= (d+1) - rem
    else base. Start positions are 1-based (SQL substring convention).
    """
    k = d + 1
    base = (length_col / k).cast("int")          # floor: length >= 0
    rem = length_col % k
    return F.transform(
        F.sequence(F.lit(0), F.lit(d)),
        lambda i: F.struct(
            i.cast("int").alias("slot"),
            (F.lit(1) + i * base
             + F.greatest(i - (F.lit(k) - rem), F.lit(0))).cast("int")
            .alias("start"),
            (base + F.when(i >= F.lit(k) - rem, 1).otherwise(0)).cast("int")
            .alias("seg_len")))


def edit_distance_join(left: DataFrame, right: DataFrame,
                       l_id: str, l_str: str, r_id: str, r_str: str,
                       max_distance: int = 1) -> DataFrame:
    """All pairs with ``levenshtein(left.l_str, right.r_str) <=
    max_distance`` — exact result, never an all-pairs plan.

    Returns (``l_id``, ``r_id``, ``distance``); NULL strings never
    match (SQL comparison semantics). Both inputs must be unique on
    their id column (the pair-dedup groups on the id pair).
    """
    d = int(max_distance)
    if d < 0:
        raise ValueError("max_distance must be >= 0")
    lf = (left.select(F.col(l_id).alias("_lid"),
                      F.col(l_str).alias("_ls"))
          .filter(F.col("_ls").isNotNull())
          .withColumn("_ll", F.length("_ls")))
    rf = (right.select(F.col(r_id).alias("_rid"),
                       F.col(r_str).alias("_rs"))
          .filter(F.col("_rs").isNotNull())
          .withColumn("_rl", F.length("_rs")))

    # The pigeonhole proof needs every segment non-empty, i.e. left
    # length >= d + 1. Shorter left strings (length <= d) are within
    # distance d of ANY string of length <= 2d — near-total recall, so
    # blocking cannot help; they pair directly against the right rows
    # of length <= 2d and the exact residual decides. This branch's
    # cost is the true output size for such strings, which any exact
    # algorithm pays.
    short = (lf.filter(F.col("_ll") <= d)
             .crossJoin(rf.filter(F.col("_rl") <= 2 * d))
             .select("_lid", "_ls", "_rid", "_rs"))

    # LEFT main path (length >= d + 1): one row per (string, slot)
    segs = (lf.filter(F.col("_ll") > d)
            .withColumn("_seg", F.explode(_segments(F.col("_ls"),
                                                    F.col("_ll"), d)))
            .select("_lid", "_ls", "_ll",
                    F.col("_seg.slot").alias("_slot"),
                    F.col("_seg.start").alias("_lstart"),
                    F.col("_seg.seg_len").alias("_slen"))
            .withColumn("_stext", F.col("_ls").substr(F.col("_lstart"),
                                                      F.col("_slen"))))

    # RIGHT: substrings for every candidate left length and slot within
    # the ±d position window — the join key mirrors the left layout.
    # Windows are built with explicit lo<=hi guards: Spark's sequence()
    # runs DESCENDING when lo > hi, which would enumerate junk starts.
    cand_lens = F.sequence(F.greatest(F.col("_rl") - d, F.lit(d + 1)),
                           F.col("_rl") + d)
    start_lo = F.greatest(F.col("_home") - d, F.lit(1))
    start_hi = F.least(F.col("_home") + d,
                       F.col("_rl") - F.col("_slen") + 1)
    subs = (rf.filter(F.col("_rl") + d >= d + 1)
            .withColumn("_ll", F.explode(cand_lens))
            .withColumn("_seg", F.explode(_segments(F.col("_rs"),
                                                    F.col("_ll"), d)))
            .select("_rid", "_rs", "_rl", "_ll",
                    F.col("_seg.slot").alias("_slot"),
                    F.col("_seg.start").alias("_home"),
                    F.col("_seg.seg_len").alias("_slen"))
            .filter(F.col("_slen") > 0)
            .withColumn("_rstart", F.explode(
                F.when(start_hi >= start_lo,
                       F.sequence(start_lo, start_hi))
                .otherwise(F.array())))
            .withColumn("_stext", F.col("_rs").substr(F.col("_rstart"),
                                                      F.col("_slen"))))

    main = (segs.join(subs,
                      (segs["_ll"] == subs["_ll"])
                      & (segs["_slot"] == subs["_slot"])
                      & (segs["_stext"] == subs["_stext"])
                      # aligned: the matched substring sits within ±d
                      # of the segment's home position in the LEFT
                      & (F.abs(segs["_lstart"] - subs["_rstart"]) <= d))
            .select(segs["_lid"], segs["_ls"], subs["_rid"], subs["_rs"]))

    pairs = main.unionByName(short).dropDuplicates(["_lid", "_rid"])
    dist = F.levenshtein(F.col("_ls"), F.col("_rs"))
    return (pairs.withColumn("distance", dist.cast("int"))
            .filter(F.col("distance") <= d)
            .select(F.col("_lid").alias(l_id), F.col("_rid").alias(r_id),
                    "distance"))
