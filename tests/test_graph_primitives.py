"""Graph primitives: connected components (both strategies), degrees,
communities."""

import random

import pytest

from graphrag_rs_spark.operators.graph import (
    communities,
    connected_components,
    degrees,
)


def _random_component_graph(seed=7, n_components=6, max_size=8):
    """Known-partition random graph: each component is a random tree plus
    a few extra intra-component edges."""
    rng = random.Random(seed)
    edges, truth = [], {}
    node_id = 0
    for c in range(n_components):
        size = rng.randint(2, max_size)
        members = [f"n{node_id + i:03d}" for i in range(size)]
        node_id += size
        for i, m in enumerate(members):
            truth[m] = members[0]  # min string id = first member
            if i:
                edges.append((m, members[rng.randrange(i)]))
        for _ in range(rng.randint(0, 2)):
            a, b = rng.sample(members, 2)
            edges.append((a, b))
    rng.shuffle(edges)
    return edges, truth


@pytest.mark.parametrize("strategy", ["local", "distributed"])
def test_connected_components_strategies_match_truth(spark, strategy):
    edges, truth = _random_component_graph()
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, strategy=strategy).collect()
    }
    assert got == truth


def test_connected_components_auto_picks_local_for_small(spark):
    edges, truth = _random_component_graph(seed=11)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == truth


def test_degrees_counts_both_endpoints(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "subj string, obj string"
    )
    got = {r["id"]: r["degree"] for r in degrees(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_communities_sizes(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "subj string, obj string"
    )
    got = {r["id"]: (r["community_id"], r["community_size"])
           for r in communities(df).collect()}
    assert got["a"] == ("a", 3) and got["c"] == ("a", 3)
    assert got["x"] == ("x", 2) and got["y"] == ("x", 2)
