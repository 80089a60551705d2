"""Size-gated exact centralities + Dijkstra shortest path
(graphrag-rs graph/analytics.rs:219-344).

The reference implementations are driver-style toys — betweenness runs a
full Dijkstra per ORDERED node pair (O(V³ log V)), closeness one Dijkstra
per target — so a faithful port cannot be distributed and MUST NOT run on
a big graph. These operators therefore collect the edge list only below
``max_nodes`` and raise otherwise; the contract at scale is "exact on a
bounded (sub)graph", the same way the reference is only usable on small
graphs. (K-hop/ego extraction from graphrag_rs_spark.operators.traversal
produces such subgraphs.)

Ported quirks, reproduced deliberately:

* betweenness counts ORDERED (source, target) pairs whose single
  Dijkstra-found path passes through the node — each unordered pair
  contributes twice — then normalizes by (n−1)(n−2)/2
  (analytics.rs:219-247).
* closeness = reachable / total_distance over Dijkstra distances
  (analytics.rs:250-271).
* The reference's Dijkstra breaks distance ties by HashSet iteration order
  (nondeterministic); ours breaks ties by min node id so results are
  stable — the ONLY deliberate deviation.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GraphTooLargeError(ValueError):
    """Raised when an exact-only centrality is asked to collect a graph
    above its node cap."""


def _collect_adjacency(
    edges: DataFrame, src: str, dst: str, weight: str | None, max_nodes: int
) -> dict[str, list[tuple[str, float]]]:
    cols = [F.col(src).alias("u"), F.col(dst).alias("v")]
    cols.append(
        F.col(weight).cast("double").alias("w") if weight else F.lit(1.0).alias("w")
    )
    e = edges.select(*cols).where(F.col("u") != F.col("v")).distinct()
    n_nodes = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .count()
    )
    if n_nodes > max_nodes:
        raise GraphTooLargeError(
            f"{n_nodes} nodes exceeds the exact-centrality cap of {max_nodes}; "
            "extract a subgraph (ego/k-hop) first — the reference algorithm "
            "is O(V^3) and cannot be run at scale"
        )
    adj: dict[str, list[tuple[str, float]]] = defaultdict(list)
    for r in e.collect():
        adj[r["u"]].append((r["v"], float(r["w"])))
        adj[r["v"]].append((r["u"], float(r["w"])))
    for n in adj:
        adj[n].sort()
    return adj


def _dijkstra(
    adj: dict[str, list[tuple[str, float]]], start: str
) -> tuple[dict[str, float], dict[str, str]]:
    """Distances + predecessor tree; ties broken by min node id (stable
    stand-in for the reference's unstable HashSet scan)."""
    dist: dict[str, float] = {start: 0.0}
    prev: dict[str, str] = {}
    heap: list[tuple[float, str]] = [(0.0, start)]
    done: set[str] = set()
    while heap:
        d, u = heapq.heappop(heap)
        if u in done:
            continue
        done.add(u)
        for v, w in adj.get(u, ()):
            if v in done:
                # finalized nodes must never be relaxed — without this
                # guard the tie-break arm can rewire prev of finalized
                # nodes, and zero-weight edges then form prev cycles
                # (a<->b) that make _path_nodes walk forever
                continue
            alt = d + w
            if alt < dist.get(v, float("inf")) or (
                alt == dist.get(v, float("inf")) and prev.get(v, "￿") > u
            ):
                dist[v] = alt
                prev[v] = u
                heapq.heappush(heap, (alt, v))
    return dist, prev


def _path_nodes(prev: dict[str, str], start: str, end: str) -> list[str] | None:
    if end == start:
        return [start]
    if end not in prev:
        return None
    nodes = [end]
    cur = end
    # prev is a forest rooted at start (nodes only point at finalized
    # predecessors), so the walk is bounded by |prev|; the explicit
    # bound turns any future invariant break into "no path", not a hang
    for _ in range(len(prev) + 1):
        if cur not in prev:
            break
        cur = prev[cur]
        nodes.append(cur)
    if nodes[-1] != start:
        return None
    nodes.reverse()
    return nodes


def shortest_path(
    edges: DataFrame,
    start: str,
    end: str,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_nodes: int = 20_000,
) -> DataFrame:
    """(step, id, distance) rows of the Dijkstra path, empty if unreachable
    (analytics.rs:281-344 semantics)."""
    spark = edges.sparkSession
    adj = _collect_adjacency(edges, src, dst, weight, max_nodes)
    dist, prev = _dijkstra(adj, start)
    nodes = _path_nodes(prev, start, end)
    if nodes is None:
        return spark.createDataFrame([], "step long, id string, distance double")
    return spark.createDataFrame(
        [(i, n, float(dist.get(n, 0.0))) for i, n in enumerate(nodes)],
        "step long, id string, distance double",
    )


def betweenness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_nodes: int = 2_000,
) -> DataFrame:
    """(id, betweenness) for every node — exact port of the ordered-pair
    single-path count (analytics.rs:219-247)."""
    spark = edges.sparkSession
    adj = _collect_adjacency(edges, src, dst, weight, max_nodes)
    nodes = sorted(adj)
    n = len(nodes)
    counts = {v: 0.0 for v in nodes}
    for source in nodes:
        _, prev = _dijkstra(adj, source)
        for target in nodes:
            if target == source:
                continue
            path = _path_nodes(prev, source, target)
            if path is None:
                continue
            for interior in path[1:-1]:
                counts[interior] += 1.0
    denom = (n - 1.0) * (n - 2.0) / 2.0 if n > 2 else 0.0
    rows = [
        (v, (counts[v] / denom) if denom else 0.0) for v in nodes
    ]
    return spark.createDataFrame(rows, "id string, betweenness double")


def closeness_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    max_nodes: int = 2_000,
) -> DataFrame:
    """(id, closeness) = reachable / Σ distance (analytics.rs:250-271)."""
    spark = edges.sparkSession
    adj = _collect_adjacency(edges, src, dst, weight, max_nodes)
    rows = []
    for node in sorted(adj):
        dist, _ = _dijkstra(adj, node)
        total = sum(d for t, d in dist.items() if t != node)
        reachable = sum(1 for t in dist if t != node)
        rows.append(
            (node, (reachable / total) if reachable and total > 0 else 0.0)
        )
    return spark.createDataFrame(rows, "id string, closeness double")
