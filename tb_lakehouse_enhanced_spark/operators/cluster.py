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


# Edge-count ceiling for the driver-side fast path: 1M edges collect to
# ~tens of MB — trivially driver-safe, and union-find runs in
# milliseconds where the distributed loop pays 4-6 scheduled jobs. Above
# it (real 100 TB dedup graphs) the iterative label propagation below
# keeps everything distributed.
_LOCAL_CC_MAX_EDGES = 1_000_000


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iterations: int = 20,
                         hops: int = 1,
                         local_threshold: int | None = None) -> DataFrame:
    """(vertex, component) with component = min vertex id in the group.

    ``edges`` are undirected pairs; isolated vertices (absent from
    edges) are their own components and can be unioned in by the caller.
    """
    # the union scans `edges` twice; materialize the (usually expensive)
    # candidate-pair plan once. The local-vs-distributed decision rides
    # ONE job for the common (small) case: limit(cap+1).collect() — if
    # the result was not truncated it IS the complete edge set
    # (CollectLimit stops early otherwise). The probe cap is SMALL
    # (10k rows ~ a few hundred KB) so a billion-edge graph never
    # floods the driver just to learn "truncated"; mid-size graphs
    # (cap < n <= local_threshold) fall back to count-then-collect.
    edges = edges.persist()
    spark = edges.sparkSession
    if local_threshold is None:
        local_threshold = _LOCAL_CC_MAX_EDGES
    probe_cap = min(10_000, local_threshold)
    probe = (edges.select(F.col(src), F.col(dst))
             .limit(probe_cap + 1).collect())
    rows, n_edges = None, None
    if len(probe) <= probe_cap:
        rows = probe
    else:
        n_edges = edges.count()
        if n_edges <= local_threshold:
            rows = edges.select(F.col(src), F.col(dst)).collect()
    if rows is not None:
        # Small-graph fast path: the edge list is tiny relative to the
        # corpus it came from, so finish it on the driver — same
        # labeling, zero iterative jobs. GraphFrames/GraphX make the
        # same small-graph shortcut; the loop below is the scale path.
        edges.unpersist()
        schema = edges.select(F.col(src).alias("id"),
                              F.col(dst).alias("component")).schema
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in rows:
            if a is None or b is None:
                continue  # the distributed equi-joins drop null vertices
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:  # union by min: the root IS the label
                    ra, rb = rb, ra
                parent[rb] = ra
        out = [(v, find(v)) for v in parent]
        # explicit slice count: bare createDataFrame parallelizes the
        # local result over defaultParallelism (a 32-task job to ship
        # a few hundred labels); one slice per 50k rows keeps the
        # downstream consumer single-task at driver-fast-path sizes
        return spark.createDataFrame(
            spark.sparkContext.parallelize(
                out, max(1, len(out) // 50_000 + 1)),
            schema=schema)
    # big-graph path: n_edges already counted above (probe truncated)
    n_part = max(1, min(spark.sparkContext.defaultParallelism,
                        n_edges // 50_000 + 1))
    sym = (edges.select(F.col(src).alias("v"), F.col(dst).alias("n"))
           .unionByName(edges.select(F.col(dst).alias("v"), F.col(src).alias("n")))
           .distinct())
    verts = sym.select("v").distinct()
    # self-loops fold "own label" into the neighbor aggregation, so one
    # iteration is exactly ONE join + ONE min-aggregate (vs join + agg +
    # second join for the least() merge)
    # localCheckpoint (not persist): each round's plan must restart from
    # materialized partitions, or the lineage grows by one join per
    # iteration and Catalyst re-optimizes + re-compiles codegen for the
    # whole history every round (~2 s/iteration of pure compile time on a
    # few hundred edges). On a cluster with flaky executors use
    # checkpoint() with a reliable dir instead — same truncation.
    sym = (sym.unionByName(verts.withColumn("n", F.col("v")))
           .repartition(n_part, "n").localCheckpoint(eager=True))
    labels = (verts.withColumn("label", F.col("v"))
              .repartition(n_part, "v").localCheckpoint(eager=True))

    # labels can only decrease, so the label SUM is a strictly decreasing
    # convergence witness: one scalar aggregate per round replaces a
    # join-and-count of changed rows
    prev_sum = None
    for _ in range(max_iterations):
        # LAZY checkpoint: the convergence-sum action below materializes
        # the checkpointed partitions in the same job, so each iteration
        # is ONE job (eager + separate sum was two serial jobs/round).
        # ``hops`` propagation steps run INSIDE the round's single plan
        # (join+agg chained) before the checkpoint, so rounds ~
        # diameter/hops at one fixed round cost each. Measured on the
        # dense near-dup graphs this engine feeds it (diameter ~2-3),
        # hops=2 does NOT pay: convergence still needs its confirming
        # round and the doubled plan offsets the saved round — so the
        # default stays 1; raise it for high-diameter graphs (chains,
        # meshes) where round count, not round cost, dominates.
        step = labels
        for _h in range(hops):
            step = (sym.join(step.withColumnRenamed("v", "n"), "n")
                    .groupBy("v").agg(F.min("label").alias("label")))
        labels = step.repartition(n_part, "v").localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("v").alias("id"), F.col("label").alias("component"))


def triangle_count(edges: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Global triangle count over an undirected edge list.

    Canonical-orientation join-join: edges are oriented low->high so
    each triangle {a<b<c} is counted exactly once as (a,b)+(b,c) wedge
    closed by (a,c). Two equi-joins, both on vertex keys — the standard
    distributed formulation (at scale, orient by DEGREE instead of id so
    high-degree hubs sit on the build side of fewer wedges; id-ordering
    keeps the oracle portable here). Returns a 1-row DataFrame
    ``n_triangles`` — a clustering-coefficient input for near-dup graph
    diagnostics (dense dup-clusters close most wedges, chains close
    none).
    """
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") < F.col("b")).distinct())
    ab = e.alias("ab")
    bc = e.alias("bc")
    ac = e.alias("ac")
    wedges = ab.join(bc, F.col("ab.b") == F.col("bc.a"))
    closed = wedges.join(
        ac, (F.col("ac.a") == F.col("ab.a")) & (F.col("ac.b") == F.col("bc.b")),
        "left_semi")
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


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


def pagerank(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
             iterations: int = 10, damping: float = 0.85) -> DataFrame:
    """PageRank over a directed edge list — (vertex, rank), Σrank = 1.

    The classic power iteration as pure DataFrame rounds: each round is
    one join of the rank vector against the (static, persisted) edge
    list on src and one grouped sum on dst; dangling-vertex mass (no
    out-edges) is a scalar aggregate redistributed uniformly. The rank
    state is localCheckpoint-ed per round (same lineage discipline as
    the CC loop above). Fixed iteration count — at 100 TB this is the
    GraphX/Pregel shape with the vertex state as a DataFrame; ranks are
    float (summation order varies with partitioning), so the operator is
    validated by invariants and known closed-form graphs, not the
    value-hash oracle.
    """
    spark = edges.sparkSession
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().persist())
    # ~50k edges per partition (same sizing rule as the CC loop): a
    # billion-edge graph iterates at full parallelism, a small one
    # avoids paying 32 scheduled empty tasks per round
    n_edges = e.count()
    n_part = max(1, min(spark.sparkContext.defaultParallelism,
                        1 + n_edges // 50_000))
    e = e.repartition(n_part, "src").persist()
    verts = (e.select(F.col("src").alias("v"))
             .union(e.select(F.col("dst").alias("v"))).distinct()
             .repartition(n_part, "v").persist())
    n = verts.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # out-degree rides with the rank state so each round joins ONLY the
    # edge list (rank/deg is computed where the rank lives)
    state = (verts.join(deg, verts["v"] == deg["src"], "left")
             .select("v", F.coalesce("deg", F.lit(0)).alias("deg"),
                     (F.lit(1.0) / F.lit(float(n))).alias("rank"))
             .repartition(n_part, "v").localCheckpoint(eager=True))

    for _ in range(iterations):
        # dangling mass as a broadcast 1-row aggregate INSIDE the round's
        # plan — one scheduled job per round, not two
        dang = state.agg(
            F.sum(F.when(F.col("deg") == 0, F.col("rank"))
                  .otherwise(F.lit(0.0))).alias("_dang"))
        contrib = (state.filter(F.col("deg") > 0)
                   .join(e, state["v"] == e["src"])
                   .select(F.col("dst").alias("v"),
                           (F.col("rank") / F.col("deg")).alias("c")))
        inflow = contrib.groupBy("v").agg(F.sum("c").alias("inflow"))
        state = (state.select("v", "deg")
                 .join(inflow, "v", "left")
                 .crossJoin(F.broadcast(dang))
                 .select("v", "deg",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping) * F.col("_dang") / F.lit(float(n))
                          + F.lit(damping)
                          * F.coalesce("inflow", F.lit(0.0))).alias("rank"))
                 .repartition(n_part, "v").localCheckpoint(eager=True))

    e.unpersist()
    verts.unpersist()
    return state.select("v", "rank")
