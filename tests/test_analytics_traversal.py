"""Graph analytics (density / clustering / top-degree / communities /
label propagation — graph/analytics.rs, leiden.rs parity) and traversal
(BFS / k-hop / ego — graph/traversal.rs parity)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.analytics import (
    avg_clustering_coefficient,
    density,
    detect_communities,
    label_propagation,
    local_clustering,
    top_degree_nodes,
)
from graphrag_rs_spark.operators.traversal import (
    bfs_distances,
    ego_network,
    k_hop_neighbors,
)

# triangle a-b-c plus pendant c-d, separate pair e-f
EDGES = [
    ("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("e", "f"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


class TestAnalytics:
    def test_density(self, edges):
        # 6 nodes, 5 undirected edges: 2*5/(6*5) = 1/3
        assert density(edges) == pytest.approx(1.0 / 3.0)

    def test_local_clustering(self, edges):
        rows = {r["id"]: r for r in local_clustering(edges).collect()}
        # a: k=2, 1 triangle pair -> coef 1.0; c: k=3, one closed of three -> 1/3
        assert rows["a"]["coefficient"] == pytest.approx(1.0)
        assert rows["c"]["coefficient"] == pytest.approx(1.0 / 3.0)
        assert "d" not in rows  # k=1 excluded

    def test_avg_clustering_matches_reference_formula(self, edges):
        # nodes with k>=2: a(1.0), b(1.0), c(1/3) -> avg 7/9
        assert avg_clustering_coefficient(edges) == pytest.approx(7.0 / 9.0)

    def test_top_degree(self, edges):
        top = top_degree_nodes(edges, top_k=2).collect()
        assert top[0]["id"] == "c" and top[0]["degree"] == 3
        # centrality normalized by n-1 = 5
        assert top[0]["centrality"] == pytest.approx(3.0 / 5.0)

    def test_detect_communities(self, edges):
        rows = {r["id"]: r for r in detect_communities(edges).collect()}
        assert rows["a"]["community_id"] == rows["d"]["community_id"]
        assert rows["e"]["community_id"] != rows["a"]["community_id"]
        assert rows["a"]["community_size"] == 4
        # reference modularity: internal directed adjacency / (2 * n_nodes)
        # component {a,b,c,d}: 8 directed internal entries / (2*6) = 2/3
        assert rows["a"]["modularity"] == pytest.approx(8.0 / 12.0)

    def test_label_propagation_converges_per_component(self, edges):
        labels = {r["id"]: r["label"] for r in label_propagation(edges).collect()}
        assert labels["e"] == labels["f"]
        # triangle nodes agree on one label
        assert labels["a"] == labels["b"] == labels["c"]


class TestTraversal:
    def test_bfs_distances(self, edges):
        d = {r["id"]: r["distance"] for r in bfs_distances(
            edges, ["a"], max_depth=3, src="src", dst="dst", confidence=None
        ).collect()}
        assert d == {"a": 0, "b": 1, "c": 1, "d": 2}

    def test_multi_source(self, edges):
        d = {r["id"]: r["distance"] for r in bfs_distances(
            edges, ["d", "e"], max_depth=1, src="src", dst="dst",
            confidence=None,
        ).collect()}
        assert d == {"d": 0, "e": 0, "c": 1, "f": 1}

    def test_k_hop_exact(self, edges):
        got = {r["id"] for r in k_hop_neighbors(
            edges, ["a"], k=2, src="src", dst="dst", exact=True
        ).collect()}
        assert got == {"d"}

    def test_confidence_gate(self, spark):
        e = spark.createDataFrame(
            [("a", "b", 0.9), ("b", "c", 0.1)],
            "subj string, obj string, confidence double",
        )
        d = {r["id"] for r in bfs_distances(
            e, ["a"], max_depth=3, min_strength=0.5
        ).collect()}
        assert d == {"a", "b"}  # weak edge pruned

    def test_ego_network(self, edges):
        nodes, induced = ego_network(
            edges, "a", k_hops=1, src="src", dst="dst", confidence=None
        )
        ids = {r["id"] for r in nodes.collect()}
        assert ids == {"a", "b", "c"}
        pairs = {(r["src"], r["dst"]) for r in induced.collect()}
        assert pairs == {("a", "b"), ("b", "c"), ("a", "c")}


class TestAllPaths:
    def test_paths_in_diamond(self, spark):
        # diamond a->b->d, a->c->d plus direct a->d
        e = spark.createDataFrame(
            [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"), ("a", "d")],
            "subj string, obj string",
        )
        from graphrag_rs_spark.operators.traversal import all_paths

        got = {
            (tuple(r["path"]), r["length"])
            for r in all_paths(e, "a", "d", max_depth=3).collect()
        }
        assert (("a", "d"), 1) in got
        assert (("a", "b", "d"), 2) in got
        assert (("a", "c", "d"), 2) in got
        # no path revisits a node
        assert all(len(set(p)) == len(p) for p, _l in got)

    def test_depth_bound(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "subj string, obj string"
        )
        from graphrag_rs_spark.operators.traversal import all_paths

        assert all_paths(e, "a", "d", max_depth=2).count() == 0
        assert all_paths(e, "a", "d", max_depth=3).count() == 1
