"""Duplicate clustering: connected components over near-dup pairs.

Near-dup detection (MinHash/SimHash/cosine) yields PAIRS; a training
pipeline needs GROUPS with one canonical survivor each. This computes
connected components with iterative min-label propagation — each
iteration is a distributed join + min-aggregate (no driver-side data),
the driver only checks the converged flag. Iterations are bounded by
the component diameter, which for dedup graphs is tiny (near-dup
clusters are dense), so the loop converges in 2-4 rounds in practice
and ``max_iterations`` caps the worst case.

This is the standard large-graph CC formulation (label propagation /
"hash-to-min"); at 100 TB the edge list is shuffled on vertex id each
round and nothing ever collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iterations: int = 20) -> DataFrame:
    """(vertex, component) with component = min vertex id in the group.

    ``edges`` are undirected pairs; isolated vertices (absent from
    edges) are their own components and can be unioned in by the caller.
    """
    spark = edges.sparkSession
    sym = (edges.select(F.col(src).alias("v"), F.col(dst).alias("n"))
           .unionByName(edges.select(F.col(dst).alias("v"), F.col(src).alias("n")))
           .distinct()
           .persist())
    labels = (sym.select("v").distinct()
              .withColumn("label", F.col("v"))
              .persist())

    for _ in range(max_iterations):
        # candidate label per vertex: min over own label and neighbors'
        neigh = (sym.join(labels.withColumnRenamed("v", "n"), "n")
                 .groupBy("v").agg(F.min("label").alias("nlabel")))
        new_labels = (labels.join(neigh, "v", "left_outer")
                      .select("v", F.least(F.col("label"),
                                           F.coalesce(F.col("nlabel"), F.col("label")))
                              .alias("label"))
                      .persist())
        changed = (new_labels.alias("a")
                   .join(labels.alias("b"), F.col("a.v") == F.col("b.v"))
                   .filter(F.col("a.label") != F.col("b.label")).count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("v").alias("id"), F.col("label").alias("component"))


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Assign every document to a dup-cluster and mark the canonical
    survivor (min id in the cluster). Docs without any near-dup pair
    are their own singleton cluster."""
    cc = connected_components(pairs)
    return (docs.select(F.col(id_col).alias("id"))
            .join(cc, "id", "left_outer")
            .select("id",
                    F.coalesce(F.col("component"), F.col("id")).alias("cluster_id"))
            .withColumn("is_canonical", F.col("id") == F.col("cluster_id")))
