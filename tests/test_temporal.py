"""Temporal-analytics ports vs hand-derived reference vectors.

Fixture graph = graph/temporal.rs:432-467 (three interval edges); the
expected values below are hand-evaluated from the Rust semantics
(is_active_in_range :52-60, density :109-116, avg_degree :295-307,
churn :310-344, growth :347-370, centrality :373-393)."""

import pytest

from graphrag_rs_spark.operators.temporal import (
    evolution_metrics,
    node_churn,
    node_lifetimes,
    temporal_centrality,
    time_range,
    timestamps,
    top_growing_nodes,
)


@pytest.fixture(scope="module")
def interval_edges(spark):
    # (src, dst, ts, valid_from, valid_to) — temporal.rs:436-464
    rows = [
        ("A", "B", 100, 100, 200),
        ("B", "C", 150, 150, 250),
        ("A", "C", 200, 200, 300),
    ]
    return spark.createDataFrame(
        rows, "src string, dst string, ts long, valid_from long, valid_to long"
    )


def test_time_range_vector(interval_edges):
    # temporal.rs test_time_range (:495-501): (100, 200) — point ts only,
    # interval bounds do not extend the range.
    row = time_range(interval_edges).collect()[0]
    assert (row["min_ts"], row["max_ts"]) == (100, 200)


def test_timestamps_sorted(interval_edges):
    assert [r["ts"] for r in timestamps(interval_edges).collect()] == [
        100,
        150,
        200,
    ]


def test_node_lifetimes_vector(interval_edges):
    # test_node_lifetime (:504-510): A first=100 last=200; derived for B/C.
    lt = {
        r["node"]: (r["first_seen"], r["last_seen"])
        for r in node_lifetimes(interval_edges).collect()
    }
    assert lt == {"A": (100, 200), "B": (100, 150), "C": (150, 200)}


def test_evolution_metrics_vector(interval_edges):
    # Query start=100 end=300 granularity=50 (test_evolution_metrics
    # :513-532); exact per-window values hand-derived from overlap
    # semantics; every window (incl. the sparse last one) emits a row.
    out = evolution_metrics(interval_edges, 100, 300, 50).collect()
    got = {
        r["ts"]: (r["node_count"], r["edge_count"], r["density"], r["avg_degree"])
        for r in out
    }
    assert got[100] == (3, 2, pytest.approx(2 / 3), pytest.approx(4 / 3))
    assert got[150] == (3, 3, pytest.approx(1.0), pytest.approx(2.0))
    assert got[200] == (3, 3, pytest.approx(1.0), pytest.approx(2.0))
    assert got[250] == (3, 2, pytest.approx(2 / 3), pytest.approx(4 / 3))
    assert got[300] == (2, 1, pytest.approx(1.0), pytest.approx(1.0))
    assert len(got) == 5


def test_evolution_metrics_empty_window_zero_row(spark):
    df = spark.createDataFrame(
        [("A", "B", 100, None, None)],
        "src string, dst string, ts long, valid_from long, valid_to long",
    )
    out = {r["ts"]: r for r in evolution_metrics(df, 100, 300, 100).collect()}
    assert out[300]["node_count"] == 0
    assert out[300]["edge_count"] == 0
    assert out[300]["density"] == 0.0
    assert out[300]["avg_degree"] == 0.0


def test_node_churn_vector(spark):
    # test_node_churn (:535-571): point edges A-B@100, B-C@200 →
    # added={C}, removed={A}, stable={B}.
    df = spark.createDataFrame(
        [("A", "B", 100, None, None), ("B", "C", 200, None, None)],
        "src string, dst string, ts long, valid_from long, valid_to long",
    )
    got = {r["node"]: r["status"] for r in node_churn(df, 100, 200).collect()}
    assert got == {"A": "removed", "B": "stable", "C": "added"}


def test_top_growing_nodes_vector(spark):
    # Point edges: start window [100,150] has A-B; end window [150,200]
    # has A-C, A-D, B-C. End-snapshot degrees A2 B1 C2 D1; start degrees
    # A1 B1. Growth: C=2.0 (new), A=(2-1)/1=1.0, D=1.0 (new), B=0.0;
    # desc with node-asc tie-break → C, A, D.
    rows = [
        ("A", "B", 100),
        ("A", "C", 160),
        ("A", "D", 170),
        ("B", "C", 180),
    ]
    df = spark.createDataFrame(rows, "src string, dst string, ts long")
    df = df.withColumn("valid_from", df.ts.cast("long") * 0 + None).withColumn(
        "valid_to", df.ts.cast("long") * 0 + None
    )
    out = top_growing_nodes(df, 100, 200, 50, top_k=3).collect()
    assert [(r["node"], r["growth"]) for r in out] == [
        ("C", pytest.approx(2.0)),
        ("A", pytest.approx(1.0)),
        ("D", pytest.approx(1.0)),
    ]


def test_temporal_centrality_vector(interval_edges):
    # Hand-derived for node B, start=100 end=300 g=50: windows at
    # 100/150/200 all have V=3 and deg(B)=2 except [200,250] where
    # deg(B)=2 of {e1,e2}; [250,300] V=3 deg(B)=1 → 0.5; [300,350]
    # V=2 without B → 0.0.
    out = temporal_centrality(interval_edges, "B", 100, 300, 50).collect()
    got = {r["ts"]: r["centrality"] for r in out}
    assert got[100] == pytest.approx(1.0)
    assert got[150] == pytest.approx(1.0)
    assert got[200] == pytest.approx(1.0)
    assert got[250] == pytest.approx(0.5)
    assert got[300] == pytest.approx(0.0)


def test_self_loop_counts_once(spark):
    # node_degree filters src==n || dst==n — a self-loop is ONE edge hit
    # (temporal.rs:101-106), so avg_degree of a lone self-loop is 1.0.
    df = spark.createDataFrame(
        [("A", "A", 100, None, None)],
        "src string, dst string, ts long, valid_from long, valid_to long",
    )
    row = evolution_metrics(df, 100, 100, 50).collect()[0]
    assert row["node_count"] == 1
    assert row["avg_degree"] == pytest.approx(1.0)
    assert row["density"] == 0.0
