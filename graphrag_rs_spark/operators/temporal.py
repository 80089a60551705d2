"""Temporal-graph analytics (reference: graphrag-core/src/graph/temporal.rs).

The reference materializes a ``TemporalGraph`` in memory and loops one
snapshot per window on a single thread (temporal.rs:271-292, :373-393).
Here every windowed analytic is ONE distributed job: a tiny window table
(one row per granularity step, built with ``spark.range``) is broadcast
against the edge table on the active-in-range predicate, so each edge row
fans out to exactly the windows it overlaps and the per-window stats reduce
map-side. No driver loop, no per-window job — W windows over E edges cost
one O(E·W) broadcast-nested-loop pass plus two key-partitioned shuffles,
which survives 100 TB edge tables (W is user-granularity, always tiny).

Edge-table conventions match :func:`~graphrag_rs_spark.operators.retrieval.
snapshot_at`: ``src``/``dst`` endpoints, point timestamp ``ts``, optional
inclusive validity interval ``valid_from``/``valid_to`` (interval edges use
overlap semantics, point edges equality/containment — temporal.rs:42-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.operators.retrieval import snapshot_at, snapshot_range

__all__ = [
    "time_range",
    "timestamps",
    "node_lifetimes",
    "evolution_metrics",
    "node_churn",
    "top_growing_nodes",
    "temporal_centrality",
]


def time_range(edges: DataFrame, point_ts: str = "ts") -> DataFrame:
    """Min/max point timestamp over all edges (temporal.rs:203-212).

    The reference scans ``edge.timestamp`` only — interval bounds do NOT
    extend the range. One row ``(min_ts, max_ts)``; empty input yields
    nulls (the reference returns ``None``)."""
    return edges.agg(
        F.min(point_ts).alias("min_ts"), F.max(point_ts).alias("max_ts")
    )


def timestamps(edges: DataFrame, point_ts: str = "ts") -> DataFrame:
    """Distinct discrete time points, ascending (temporal.rs:198-200 — the
    BTreeMap key walk)."""
    return (
        edges.select(F.col(point_ts).alias("ts")).distinct().orderBy("ts")
    )


def _endpoints(src: str, dst: str):
    # array_distinct so a self-loop counts ONCE toward its node's degree,
    # matching the reference's `source == node || target == node` filter
    # (temporal.rs:101-106).
    return F.array_distinct(F.array(F.col(src), F.col(dst)))


def node_lifetimes(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    point_ts: str = "ts",
) -> DataFrame:
    """First/last point timestamp each node participates in an edge
    (temporal.rs:161-171,215-220). ``(node, first_seen, last_seen)``,
    map-side-combining min/max agg."""
    return (
        edges.select(
            F.explode(_endpoints(src, dst)).alias("node"),
            F.col(point_ts).alias("_t"),
        )
        .groupBy("node")
        .agg(F.min("_t").alias("first_seen"), F.max("_t").alias("last_seen"))
    )


def _window_table(spark, start: int, end: int, granularity: int) -> DataFrame:
    """One row per analytics window: start..end inclusive, step granularity
    (the `while current_time <= end_time` loop, temporal.rs:275-289). Each
    window spans [window_start, window_start + granularity] inclusive."""
    if granularity <= 0:
        raise ValueError("granularity must be positive")
    n = int((end - start) // granularity) + 1
    return spark.range(n).select(
        (F.lit(start) + F.col("id") * F.lit(granularity)).alias("window_start"),
        (
            F.lit(start) + (F.col("id") + F.lit(1)) * F.lit(granularity)
        ).alias("window_end"),
    )


def _windowed_edges(
    edges: DataFrame,
    windows: DataFrame,
    src: str,
    dst: str,
    point_ts: str,
    valid_from: str,
    valid_to: str,
) -> DataFrame:
    """Edges × windows on the active-in-range predicate (temporal.rs:52-60):
    interval overlap when both bounds present, else point containment,
    all bounds inclusive. The window side is broadcast — this is a
    broadcast-nested-loop join with a tiny build side, the scale-safe shape
    for a theta join."""
    interval = F.col(valid_from).isNotNull() & F.col(valid_to).isNotNull()
    active = F.when(
        interval,
        (F.col(valid_from) <= F.col("window_end"))
        & (F.col(valid_to) >= F.col("window_start")),
    ).otherwise(
        (F.col(point_ts) >= F.col("window_start"))
        & (F.col(point_ts) <= F.col("window_end"))
    )
    return edges.join(F.broadcast(windows), active)


def _per_window_counts(wedges: DataFrame, src: str, dst: str):
    edge_stats = wedges.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("edge_count"),
        F.sum(F.size(_endpoints(src, dst))).alias("total_degree"),
    )
    node_stats = (
        wedges.select(
            "window_start", F.explode(_endpoints(src, dst)).alias("node")
        )
        .distinct()
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("node_count"))
    )
    return edge_stats, node_stats


def evolution_metrics(
    edges: DataFrame,
    start: int,
    end: int,
    granularity: int,
    src: str = "src",
    dst: str = "dst",
    point_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Per-window graph evolution metrics (temporal.rs:271-307): for every
    window [t, t+granularity], t = start..end step granularity —
    ``node_count``, ``edge_count``, ``density`` = E / (V·(V-1)/2) with a
    <2-node guard (:109-116), and ``avg_degree`` = Σ node_degree / V
    (:295-307). Empty windows emit a zero row exactly as the reference
    emits a metric for every step."""
    spark = edges.sparkSession
    windows = _window_table(spark, start, end, granularity)
    wedges = _windowed_edges(
        edges, windows, src, dst, point_ts, valid_from, valid_to
    )
    edge_stats, node_stats = _per_window_counts(wedges, src, dst)
    v = F.coalesce(F.col("node_count"), F.lit(0))
    e = F.coalesce(F.col("edge_count"), F.lit(0))
    # usize division in the reference: V*(V-1) is always even, so /2 exact.
    max_edges = (v * (v - F.lit(1))) / F.lit(2)
    return (
        windows.join(edge_stats, "window_start", "left")
        .join(node_stats, "window_start", "left")
        .select(
            F.col("window_start").alias("ts"),
            v.alias("node_count"),
            e.alias("edge_count"),
            F.when(v < 2, F.lit(0.0))
            .otherwise(e / max_edges)
            .alias("density"),
            F.when(v == 0, F.lit(0.0))
            .otherwise(F.coalesce(F.col("total_degree"), F.lit(0)) / v)
            .alias("avg_degree"),
        )
        .orderBy("ts")
    )


def _snapshot_nodes(snap: DataFrame, src: str, dst: str) -> DataFrame:
    return snap.select(F.explode(_endpoints(src, dst)).alias("node")).distinct()


def node_churn(
    edges: DataFrame,
    start: int,
    end: int,
    src: str = "src",
    dst: str = "dst",
    point_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Node churn between the point snapshots at ``start`` and ``end``
    (temporal.rs:310-344): ``(node, status)`` with status ∈ added (end
    only) / removed (start only) / stable (both). Counts are a groupBy
    away; the reference's three HashSet differences are one full outer
    join here."""
    kw = dict(valid_from=valid_from, valid_to=valid_to, point_ts=point_ts)
    at_start = _snapshot_nodes(
        snapshot_at(edges, start, **kw), src, dst
    ).withColumn("_s", F.lit(1))
    at_end = _snapshot_nodes(
        snapshot_at(edges, end, **kw), src, dst
    ).withColumn("_e", F.lit(1))
    return (
        at_start.join(at_end, "node", "full_outer")
        .select(
            "node",
            F.when(F.col("_s").isNotNull() & F.col("_e").isNotNull(), "stable")
            .when(F.col("_e").isNotNull(), "added")
            .otherwise("removed")
            .alias("status"),
        )
    )


def _snapshot_degrees(snap: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        snap.select(F.explode(_endpoints(src, dst)).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def top_growing_nodes(
    edges: DataFrame,
    start: int,
    end: int,
    granularity: int,
    top_k: int = 10,
    src: str = "src",
    dst: str = "dst",
    point_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Degree growth between the first and last granularity window
    (temporal.rs:347-370): for each node of the END snapshot,
    growth = (end_deg - start_deg)/start_deg when it had start degree,
    else its raw end degree. The reference's sort is unstable on ties;
    ours tie-breaks node asc for determinism. Returns
    ``(node, growth)`` limited to ``top_k``."""
    kw = dict(valid_from=valid_from, valid_to=valid_to, point_ts=point_ts)
    start_deg = _snapshot_degrees(
        snapshot_range(edges, start, start + granularity, **kw), src, dst
    ).withColumnRenamed("degree", "start_degree")
    end_deg = _snapshot_degrees(
        snapshot_range(edges, end - granularity, end, **kw), src, dst
    ).withColumnRenamed("degree", "end_degree")
    growth = F.when(
        F.col("start_degree") > 0,
        (F.col("end_degree") - F.col("start_degree"))
        / F.col("start_degree"),
    ).otherwise(F.col("end_degree").cast("double"))
    # left join from the END snapshot: only its nodes are scored (:353).
    return (
        end_deg.join(start_deg, "node", "left")
        .select("node", growth.alias("growth"))
        .orderBy(F.desc("growth"), F.asc("node"))
        .limit(top_k)
    )


def temporal_centrality(
    edges: DataFrame,
    node: str,
    start: int,
    end: int,
    granularity: int,
    src: str = "src",
    dst: str = "dst",
    point_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Per-window degree centrality of one node (temporal.rs:373-393):
    degree(node) / (V-1) per window, 0.0 when the window has ≤1 node.
    Same single-job window fan-out as :func:`evolution_metrics` — the
    reference's per-window snapshot loop becomes one pass."""
    spark = edges.sparkSession
    windows = _window_table(spark, start, end, granularity)
    wedges = _windowed_edges(
        edges, windows, src, dst, point_ts, valid_from, valid_to
    )
    deg = wedges.groupBy("window_start").agg(
        F.sum(
            F.when(
                (F.col(src) == node) | (F.col(dst) == node), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("degree")
    )
    _, node_stats = _per_window_counts(wedges, src, dst)
    v = F.coalesce(F.col("node_count"), F.lit(0))
    return (
        windows.join(deg, "window_start", "left")
        .join(node_stats, "window_start", "left")
        .select(
            F.col("window_start").alias("ts"),
            F.when(
                v > 1, F.coalesce(F.col("degree"), F.lit(0)) / (v - F.lit(1))
            )
            .otherwise(F.lit(0.0))
            .alias("centrality"),
        )
        .orderBy("ts")
    )
