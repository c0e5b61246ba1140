"""Recursive-hierarchy queries: flatten parent-child trees to
(node, root, depth) without a recursive CTE.

Spark SQL has no ``WITH RECURSIVE`` (the reference's Databricks SQL
does not either) — but the hierarchy workloads it serves (org charts,
BOM explosion, category trees, thread/reply forests) are linear
ancestor chains, and those flatten in O(log depth) self-joins with
**pointer doubling**: every node keeps a pointer to some ancestor and
the distance to it; one round replaces each pointer with the pointee's
pointer, doubling the resolved distance. A depth-1e6 chain resolves in
20 rounds; a balanced 100 TB category tree in ~5.

Each round is ONE shuffle join of the state against itself on the
pointer key (no driver-side data; the driver only checks the
"all resolved" flag), and the state is localCheckpoint-ed per round so
codegen never recompiles a growing lineage (see cluster.py's CC loop —
same discipline). The DuckDB oracle is the textbook WITH RECURSIVE
walk, making this the engine's recursive-CTE parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Driver fast path ceiling, same rationale as cluster.py's union-find
# shortcut: 1M (id, parent) pairs collect to tens of MB and resolve in
# milliseconds of path-compressed pointer chasing, where the distributed
# loop pays log(depth) scheduled join rounds. Above it (real 100 TB
# forests) the pointer-doubling loop keeps everything distributed.
_LOCAL_MAX_NODES = 1_000_000


def flatten_hierarchy(nodes: DataFrame, id_col: str = "id",
                      parent_col: str = "parent_id",
                      max_iterations: int = 40,
                      local_threshold: int | None = None) -> DataFrame:
    """Resolve each node's root ancestor and depth.

    ``nodes`` has one row per node; ``parent_col`` IS NULL marks roots.
    Returns (id, root_id, depth) with depth 0 for roots. Assumes a
    forest (every chain terminates at a NULL-parent node); cycles or
    dangling parent ids leave their rows unresolved past
    ``max_iterations`` and raise.
    """
    spark = nodes.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    if local_threshold is None:
        local_threshold = _LOCAL_MAX_NODES

    nodes = nodes.persist()
    if nodes.count() <= local_threshold:
        pairs = nodes.select(id_col, parent_col).collect()
        nodes.unpersist()
        parent = {r[0]: r[1] for r in pairs}
        memo: dict = {}  # id -> (root, depth)

        def resolve(x):
            path = []
            while x not in memo:
                p = parent.get(x, "__missing__")
                if p is None:
                    memo[x] = (x, 0)
                    break
                if p == "__missing__" or len(path) > len(parent):
                    raise ValueError(
                        "cycle or dangling parent id at node "
                        f"{x!r} — cannot flatten")
                path.append(x)
                x = p
            while path:
                y = path.pop()
                r, d = memo[parent[y]]
                memo[y] = (r, d + 1)

        for i in parent:
            resolve(i)
        out = [(i, memo[i][0], memo[i][1]) for i in parent]
        id_t = dict(nodes.dtypes)[id_col]
        # explicit slice count: bare createDataFrame parallelizes over
        # defaultParallelism — a 32-task job to ship a small local
        # result (driver fast-path sizes stay single-task)
        return spark.createDataFrame(
            spark.sparkContext.parallelize(
                out, max(1, len(out) // 50_000 + 1)),
            f"id {id_t}, root_id {id_t}, depth bigint")

    is_root = F.col(parent_col).isNull()
    # state: id -> (anc pointer, hops to anc, anc is a root)
    state = (nodes.select(
        F.col(id_col).alias("id"),
        F.when(is_root, F.col(id_col)).otherwise(F.col(parent_col))
        .alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).cast("bigint")
        .alias("d"),
        is_root.alias("fin"))
        .repartition(n_part, "id").localCheckpoint(eager=True))
    nodes.unpersist()

    for _ in range(max_iterations):
        if state.filter(~F.col("fin")).limit(1).count() == 0:
            break
        m = state.select(F.col("id").alias("m_id"), F.col("anc").alias("m_anc"),
                         F.col("d").alias("m_d"), F.col("fin").alias("m_fin"))
        # unresolved rows jump: anc <- anc.anc, d += anc.d; resolved rows
        # pass through untouched (left join keeps them aligned, no union)
        state = (state.join(m, state["anc"] == m["m_id"], "left")
                 .select(
                     "id",
                     F.when(F.col("fin"), F.col("anc")).otherwise(F.col("m_anc"))
                     .alias("anc"),
                     F.when(F.col("fin"), F.col("d"))
                     .otherwise(F.col("d") + F.col("m_d")).alias("d"),
                     F.when(F.col("fin"), F.lit(True))
                     .otherwise(F.coalesce(F.col("m_fin"), F.lit(False)))
                     .alias("fin"))
                 .repartition(n_part, "id").localCheckpoint(eager=True))
    else:
        unresolved = state.filter(~F.col("fin")).count()
        if unresolved:
            raise ValueError(
                f"{unresolved} nodes unresolved after {max_iterations} "
                "doubling rounds — cycle or dangling parent id")

    return state.select("id", F.col("anc").alias("root_id"),
                        F.col("d").alias("depth"))


def subtree_rollup(nodes: DataFrame, measures: dict[str, str],
                   id_col: str = "id",
                   parent_col: str = "parent_id") -> DataFrame:
    """Aggregate measures over each root's whole subtree.

    ``measures`` maps output name -> input column; each is SUMmed over
    all descendants (root included). One flatten + one grouped agg —
    the 'explode the tree then roll up' shape recursive CTEs are
    usually written for.
    """
    flat = flatten_hierarchy(nodes, id_col=id_col, parent_col=parent_col)
    joined = flat.join(nodes.withColumnRenamed(id_col, "id"), "id")
    aggs = [F.sum(src).alias(out) for out, src in measures.items()]
    return (joined.groupBy("root_id")
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.max("depth").alias("max_depth"), *aggs))


def ancestor_closure(nodes: DataFrame, id_col: str = "id",
                     parent_col: str = "parent_id",
                     max_iterations: int = 40) -> DataFrame:
    """Full transitive ancestor closure: one row per (node, ancestor)
    pair with the hop distance (>= 1; self pairs excluded).

    Repeated squaring: P(1) = parent edges; each round unions
    P <- P ∪ (P ∘ P), doubling the reachable distance, so a depth-d
    forest closes in ceil(log2 d) rounds of one self-join + distinct
    each (the output is Σ depth(v) rows — the closure IS the product,
    there is no cheaper shape). This powers per-ANCESTOR subtree
    rollups (BOM explosion: every assembly's total over all transitive
    parts), where ``flatten_hierarchy`` only resolves roots.
    """
    pairs = (nodes.filter(F.col(parent_col).isNotNull())
             .select(F.col(id_col).alias("id"),
                     F.col(parent_col).alias("anc"),
                     F.lit(1).cast("bigint").alias("dist"))
             .localCheckpoint(eager=True))
    for _ in range(max_iterations):
        n_before = pairs.count()
        hop = pairs.select(F.col("anc").alias("_j"), F.col("id"),
                           F.col("dist").alias("_d1"))
        ext = (hop.join(pairs.select(F.col("id").alias("_j"),
                                     F.col("anc"),
                                     F.col("dist").alias("_d2")), "_j")
               .select("id", "anc", (F.col("_d1") + F.col("_d2"))
                       .alias("dist")))
        pairs = (pairs.unionByName(ext)
                 .groupBy("id", "anc").agg(F.min("dist").alias("dist"))
                 .localCheckpoint(eager=True))
        if pairs.count() == n_before:
            break
    else:
        raise ValueError(
            f"closure still growing after {max_iterations} squaring "
            "rounds — cycle in the parent graph")
    return pairs


def subtree_rollup_per_node(nodes: DataFrame, measures: dict[str, str],
                            id_col: str = "id",
                            parent_col: str = "parent_id") -> DataFrame:
    """Aggregate measures over EVERY node's transitive subtree (the
    node itself included) — the per-assembly BOM rollup. One closure +
    one union (self pairs) + one grouped agg on the ancestor key."""
    closure = ancestor_closure(nodes, id_col=id_col, parent_col=parent_col)
    selfp = nodes.select(F.col(id_col).alias("id"),
                         F.col(id_col).alias("anc"),
                         F.lit(0).cast("bigint").alias("dist"))
    membership = closure.unionByName(selfp)
    joined = membership.join(
        nodes.withColumnRenamed(id_col, "id"), "id")
    aggs = [F.sum(src).alias(out) for out, src in measures.items()]
    return (joined.groupBy(F.col("anc").alias("node_id"))
            .agg(F.count(F.lit(1)).alias("n_desc"),
                 F.max("dist").alias("max_depth"), *aggs))
