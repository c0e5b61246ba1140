"""Connected-components dedup clustering."""

from __future__ import annotations

from tb_lakehouse_enhanced_spark.operators.cluster import (
    connected_components, dedup_clusters,
)


def test_connected_components_chain_and_islands(spark):
    # components: {1,2,3,4} (chain), {10,11}, isolated vertices absent
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # driver-side union-find fast path (default for small edge lists) ...
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == expected
    # ... and the distributed label-propagation loop (the 100 TB path)
    # produce the identical labeling
    got_dist = {r["id"]: r["component"]
                for r in connected_components(edges, local_threshold=0).collect()}
    assert got_dist == expected


def test_dedup_clusters_with_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 7, 9)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    rows = {r["id"]: (r["cluster_id"], r["is_canonical"])
            for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {1: (1, True), 2: (1, False), 3: (1, False),
                    7: (7, True), 9: (9, True)}


def test_triangle_count_known_graph(spark):
    from tb_lakehouse_enhanced_spark.operators.cluster import triangle_count
    # K4 on {1,2,3,4} has 4 triangles; plus a pendant chain 4-5-6 adds 0
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (6, 5),        # chain, reversed orientation on purpose
         (2, 1)],               # duplicate edge, other direction
        "id_a long, id_b long")
    [row] = triangle_count(edges).collect()
    assert row["n_triangles"] == 4


def test_pagerank_cycle_uniform_and_star(spark):
    from tb_lakehouse_enhanced_spark.operators.cluster import pagerank

    # 3-cycle: symmetric -> uniform 1/3 regardless of damping
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "id_a long, id_b long")
    got = {r["v"]: r["rank"] for r in pagerank(cyc, iterations=25).collect()}
    assert all(abs(x - 1 / 3) < 1e-9 for x in got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # star a->hub from 3 leaves: hub absorbs, leaves only get base mass.
    # Closed form with dangling redistribution: solve two-state fixpoint.
    star = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "id_a long, id_b long")
    got = {r["v"]: r["rank"] for r in pagerank(star, iterations=60).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    leaf, hub, d, n = got[1], got[0], 0.85, 4
    # fixpoint identities: leaf = (1-d)/n + d*hub/n ; hub = leaf*3*d + that base
    assert abs(leaf - ((1 - d) / n + d * hub / n)) < 1e-9
    assert abs(hub - (3 * d * leaf + (1 - d) / n + d * hub / n)) < 1e-9
    assert hub > 3 * leaf
