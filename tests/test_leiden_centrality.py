"""Leiden community detection (graph/leiden.rs:469-540) and size-gated
exact centralities (graph/analytics.rs:219-344)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.centrality import (
    GraphTooLargeError,
    betweenness_centrality,
    closeness_centrality,
    shortest_path,
)
from graphrag_rs_spark.operators.leiden import leiden_communities


def _two_cliques(spark, bridge=True):
    edges = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((f"v{base + i}", f"v{base + j}"))
    if bridge:
        edges.append(("v4", "v10"))
    return spark.createDataFrame(edges, "src string, dst string")


def test_leiden_local_separates_cliques(spark):
    out = {
        r["id"]: (r["community_id"], r["community_size"])
        for r in leiden_communities(_two_cliques(spark)).collect()
    }
    assert all(out[f"v{i}"] == ("v0", 5) for i in range(5))
    assert all(out[f"v{10 + i}"] == ("v10", 5) for i in range(5))


def test_leiden_distributed_matches_on_cliques(spark):
    df = _two_cliques(spark)
    local = {
        (r["id"], r["community_id"])
        for r in leiden_communities(df).collect()
    }
    dist = {
        (r["id"], r["community_id"])
        for r in leiden_communities(df, local_threshold=0).collect()
    }
    assert dist == local


def test_leiden_refinement_splits_disconnected_community(spark):
    """Two components that local moving cannot merge (no edges between
    them) must never share a community — the refinement contract."""
    edges = [("a1", "a2"), ("a2", "a3"), ("b1", "b2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["id"]: r["community_id"] for r in leiden_communities(df).collect()}
    assert {out["a1"], out["a2"], out["a3"]} & {out["b1"], out["b2"]} == set()


def test_betweenness_path_graph_closed_form(spark):
    # path a-b-c-d-e: interior node at offset i lies on 2*i*(4-i) ordered
    # pairs; denominator (5-1)(5-2)/2 = 6
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["betweenness"] for r in betweenness_centrality(df).collect()}
    expect = {"a": 0.0, "b": 2 * 1 * 3 / 6.0, "c": 2 * 2 * 2 / 6.0,
              "d": 2 * 3 * 1 / 6.0, "e": 0.0}
    assert got == pytest.approx(expect)


def test_closeness_star_graph(spark):
    # star: hub h at distance 1 from 4 leaves; leaves at 1 + 2+2+2
    edges = [("h", x) for x in "abcd"]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["closeness"] for r in closeness_centrality(df).collect()}
    assert got["h"] == pytest.approx(4 / 4.0)
    assert got["a"] == pytest.approx(4 / 7.0)


def test_shortest_path_weighted(spark):
    # direct a-c costs 10; detour a-b-c costs 3
    edges = [("a", "c", 10.0), ("a", "b", 1.0), ("b", "c", 2.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    rows = shortest_path(df, "a", "c", weight="w").collect()
    assert [(r["step"], r["id"], r["distance"]) for r in rows] == [
        (0, "a", 0.0), (1, "b", 1.0), (2, "c", 3.0)
    ]


def test_shortest_path_zero_weight_edges_terminate(spark):
    # zero-weight triangle s-a, s-b, a-b: the tie-break arm used to relax
    # FINALIZED nodes, rewiring prev into an a<->b cycle that made the
    # path walk spin forever; the done-guard keeps prev a forest
    edges = [("s", "a", 0.0), ("s", "b", 0.0), ("a", "b", 0.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    rows = shortest_path(df, "s", "b", weight="w").collect()
    assert rows[0]["id"] == "s" and rows[-1]["id"] == "b"
    assert rows[-1]["distance"] == 0.0
    assert len(rows) <= 3
    # betweenness on the same graph must also terminate
    got = betweenness_centrality(df, weight="w").collect()
    assert len(got) == 3


def test_shortest_path_unreachable_is_empty(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "src string, dst string"
    )
    assert shortest_path(df, "a", "d").count() == 0


def test_centrality_gate_refuses_large_graphs(spark):
    edges = [(f"x{i}", f"x{i + 1}") for i in range(30)]
    df = spark.createDataFrame(edges, "src string, dst string")
    with pytest.raises(GraphTooLargeError):
        betweenness_centrality(df, max_nodes=10)
