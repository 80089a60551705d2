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


def test_connected_components_auto_picks_distributed_above_threshold(spark):
    """Above ``local_threshold`` auto must route to large-star/small-star
    (no driver collect) and still produce min-string components."""
    edges = [(f"x{i}", f"x{i+1}") for i in range(10)] + [("z1", "z2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["id"], r["component"])
        for r in connected_components(df, local_threshold=2).collect()
    }
    chain = {(f"x{i}", "x0") for i in range(11)}
    assert got == chain | {("z1", "z1"), ("z2", "z1")}


def test_greedy_replay_reblocks_oversized_components():
    """A component above MAX_COMPONENT_GREEDY must be re-blocked by
    (type, first token) — every sub-block clusters internally, and the
    result covers all members without an O(n²) scan over the whole
    component."""
    import pandas as pd

    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.operators.canonicalize import (
        MAX_COMPONENT_GREEDY,
        _greedy_replay_udf,
    )

    n = MAX_COMPONENT_GREEDY + 500
    rows = []
    for i in range(n):
        # 50 distinct leading tokens -> 50 sub-blocks of ~50 members, each
        # containing near-duplicate spellings that must merge
        fam = i % 50
        variant = "x" * (i % 3)  # second token varies; first token is
        # the sub-block key and must stay identical within a family
        rows.append(
            {
                "entity_id": f"E_{i:05d}",
                "norm_name": f"family{fam:02d} shared{variant}",
                "entity_type": "person",
                "confidence": 0.5 + (i % 7) / 100.0,
                "conv_id": f"c{i:05d}",
                "chunk_idx": 0,
                "rank": 0,
            }
        )
    pdf = pd.DataFrame(rows)
    out = _greedy_replay_udf(PipelineConfig())(pdf)
    assert set(out["entity_id"]) == {r["entity_id"] for r in rows}
    # near-duplicate families must still merge inside their sub-block
    clusters_per_family = {}
    for eid, cid in zip(out["entity_id"], out["cluster_id"]):
        fam = int(eid[2:]) % 50
        clusters_per_family.setdefault(fam, set()).add(cid)
    assert all(len(c) == 1 for c in clusters_per_family.values()), (
        "each re-blocked family should collapse to one cluster"
    )
