"""Node2Vec / GraphSAGE graph embeddings (graph/embeddings.rs:511-609
test mod, plus structural checks the reference's unseeded rng can't pin).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.graph_embeddings import (
    adjacency_lists,
    graphsage_embeddings,
    node2vec_embeddings,
    node2vec_walks,
)

# rs:515-527 create_test_graph: 5 nodes, 6 undirected edges
EDGES = [
    ("A", "B", 1.0),
    ("A", "C", 1.0),
    ("B", "C", 1.0),
    ("B", "D", 1.0),
    ("C", "D", 1.0),
    ("D", "E", 1.0),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, weight double")


def test_embedding_graph_creation(spark, edges_df):
    # rs:529-535: 5 nodes; A has exactly 2 neighbors (undirected)
    adj = adjacency_lists(edges_df, weight="weight")
    rows = {r["node"]: r["neighbors"] for r in adj.collect()}
    assert len(rows) == 5
    assert {n["nb"] for n in rows["A"]} == {"B", "C"}
    assert {n["nb"] for n in rows["E"]} == {"D"}
    assert all(n["w"] == 1.0 for ns in rows.values() for n in ns)


def test_random_walk_generation(spark, edges_df):
    # rs:589-604: walks_per_node=1 → 5 walks, each ≤ walk_length
    adj = adjacency_lists(edges_df)
    walks = node2vec_walks(adj, walk_length=5, walks_per_node=1, seed=7)
    rows = walks.collect()
    assert len(rows) == 5
    assert {r["start"] for r in rows} == {"A", "B", "C", "D", "E"}
    adj_map = {
        r["node"]: {n["nb"] for n in r["neighbors"]} for r in adj.collect()
    }
    for r in rows:
        walk = r["walk"]
        assert 1 <= len(walk) <= 5
        assert walk[0] == r["start"]
        # every hop follows a real edge
        for a, b in zip(walk, walk[1:]):
            assert b in adj_map[a], f"walk {walk} hops {a}->{b} off-graph"


def test_walks_deterministic(spark, edges_df):
    adj = adjacency_lists(edges_df)
    w1 = sorted(
        tuple(r["walk"])
        for r in node2vec_walks(
            adj, walk_length=6, walks_per_node=2, seed=11
        ).collect()
    )
    w2 = sorted(
        tuple(r["walk"])
        for r in node2vec_walks(
            adj, walk_length=6, walks_per_node=2, seed=11
        ).collect()
    )
    assert w1 == w2


def test_return_param_bias(spark, edges_df):
    # with return_param → 0+, walks ping-pong back to prev almost surely;
    # with a huge return_param they should rarely return immediately.
    adj = adjacency_lists(edges_df)
    clingy = node2vec_walks(
        adj, walk_length=4, walks_per_node=8, seed=3, return_param=1e-9
    ).collect()
    n_return = sum(
        1 for r in clingy if len(r["walk"]) >= 3 and r["walk"][2] == r["walk"][0]
    )
    n_eligible = sum(1 for r in clingy if len(r["walk"]) >= 3)
    assert n_eligible > 0
    assert n_return == n_eligible  # prob(return) → 1 as p → 0


def test_node2vec_fit(spark, edges_df):
    # rs:544-563: every node gets a dimension-length embedding
    emb = node2vec_embeddings(
        edges_df,
        weight="weight",
        dimension=16,
        walk_length=10,
        walks_per_node=5,
        context_size=3,
        epochs=1,
        seed=5,
    )
    rows = {r["node"]: r["embedding"] for r in emb.collect()}
    assert set(rows) == {"A", "B", "C", "D", "E"}
    assert all(len(v) == 16 for v in rows.values())
    assert all(
        all(not math.isnan(x) for x in v) for v in rows.values()
    )


def test_node2vec_component_separation(spark):
    # two disconnected cliques: walks never cross, so skip-gram
    # co-occurrence puts same-clique nodes closer than cross-clique
    left = [(f"L{i}", f"L{j}", 1.0) for i in range(4) for j in range(i + 1, 4)]
    right = [(f"R{i}", f"R{j}", 1.0) for i in range(4) for j in range(i + 1, 4)]
    sdf = spark.createDataFrame(
        left + right, "src string, dst string, weight double"
    )
    emb = node2vec_embeddings(
        sdf,
        dimension=16,
        walk_length=12,
        walks_per_node=10,
        context_size=4,
        epochs=3,
        seed=13,
    )
    vecs = {r["node"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(y * y for y in b))
        return num / (da * db) if da and db else 0.0

    within = [
        cos(vecs[f"L{i}"], vecs[f"L{j}"])
        for i in range(4)
        for j in range(i + 1, 4)
    ] + [
        cos(vecs[f"R{i}"], vecs[f"R{j}"])
        for i in range(4)
        for j in range(i + 1, 4)
    ]
    across = [cos(vecs[f"L{i}"], vecs[f"R{j}"]) for i in range(4) for j in range(4)]
    assert sum(within) / len(within) > sum(across) / len(across)


def test_graphsage_fit(spark, edges_df):
    # rs:566-586: every node gets a dimension-length embedding
    emb = graphsage_embeddings(
        edges_df, dimension=8, num_layers=2, samples_per_layer=(3, 2), seed=9
    )
    rows = {r["node"]: r["embedding"] for r in emb.collect()}
    assert set(rows) == {"A", "B", "C", "D", "E"}
    assert all(len(v) == 8 for v in rows.values())
    # features start in [0,1) and every layer averages values in range →
    # embeddings stay in [0,1)
    assert all(0.0 <= x < 1.0 for v in rows.values() for x in v)


def test_graphsage_mean_combine_exact(spark):
    # hand-derived: path graph A-B with known features, 1 layer, mean agg:
    # new_A = (A + B)/2 elementwise (B is A's only neighbor), rs:486-498
    sdf = spark.createDataFrame([("A", "B")], "src string, dst string")
    feats = spark.createDataFrame(
        [("A", [0.0, 1.0]), ("B", [1.0, 0.0])],
        "node string, features array<float>",
    )
    emb = graphsage_embeddings(
        sdf, dimension=2, num_layers=1, samples_per_layer=(5,), features=feats
    )
    rows = {r["node"]: list(r["embedding"]) for r in emb.collect()}
    assert rows["A"] == pytest.approx([0.5, 0.5])
    assert rows["B"] == pytest.approx([0.5, 0.5])


def test_graphsage_isolated_node_zero_agg(spark):
    # a node with no sampled neighbors aggregates the zero vector
    # (rs:443-445): new = (self + 0)/2
    sdf = spark.createDataFrame([("A", "B")], "src string, dst string")
    feats = spark.createDataFrame(
        [("A", [0.4, 0.8]), ("B", [0.4, 0.8]), ("Z", [0.8, 0.4])],
        "node string, features array<float>",
    )
    # Z is not in the edge list → graphsage only embeds edge-connected
    # nodes (the reference's EmbeddingGraph is built FROM edges, rs:77);
    # verify Z is absent rather than silently zeroed
    emb = graphsage_embeddings(
        sdf, dimension=2, num_layers=1, samples_per_layer=(5,), features=feats
    )
    assert {r["node"] for r in emb.collect()} == {"A", "B"}
