"""Graph analytics: density, clustering coefficient, top-degree nodes,
community detection with modularity, label propagation.

Parity targets (graphrag-rs graph/analytics.rs):

* ``density`` — 2·E / (n·(n−1)) over the undirected deduped edge set
  (analytics.rs:436-446).
* ``local_clustering`` / ``avg_clustering_coefficient`` — per-node
  triangles/(k(k−1)) counting ordered neighbor pairs, averaged over nodes
  with k ≥ 2 (analytics.rs:452-485). Distributed as a wedge join + edge
  hash-join (the standard Spark triangle count), not per-node adjacency
  scans.
* ``top_degree_nodes`` — degree/(n−1) centrality, top-k desc
  (analytics.rs:209-216, 416-430).
* ``detect_communities`` — connected components as communities with a
  per-community modularity score. NOTE the reference's formula divides by
  ``2 * adjacency.len()`` which is the NODE count, not the edge count
  (analytics.rs:158-176: ``total_edges = self.adjacency.len()``); we
  reproduce that exact behavior and name the denominator honestly.
* ``label_propagation`` — synchronous LPA with deterministic min-label
  tie-breaking; the scalable stand-in for the reference's single-level
  Leiden (graph/leiden.rs:469-540 runs one local-moving level despite the
  hierarchical API).

All operators take an edge DataFrame (src, dst) and treat it as
undirected simple graph (self-loops dropped, duplicates collapsed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.graph import connected_components, degrees


def _simple_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Normalized undirected simple edges: (u < v), distinct, no loops."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _sym(edges_uv: DataFrame) -> DataFrame:
    return edges_uv.union(
        edges_uv.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def density(edges: DataFrame, src: str = "src", dst: str = "dst") -> float:
    """Graph density 2E/(n(n−1)) (analytics.rs:436-446); driver scalar."""
    e = _simple_undirected(edges, src, dst).cache()
    n = e.select(F.explode(F.array("u", "v")).alias("id")).distinct().count()
    m = e.count()
    e.unpersist()
    if n <= 1:
        return 0.0
    return (2.0 * m) / (n * (n - 1.0))


def local_clustering(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, degree, triangles, coefficient) per node with k ≥ 2
    (analytics.rs:452-485: coefficient = ordered-neighbor-pair triangles
    / (k(k−1)) = 2·tri/(k(k−1))).

    Plan shape: wedge enumeration via one self-join of the symmetric edge
    list on the center node, then a semi-join-style inner join against the
    normalized edge set to keep closed wedges. Two shuffles on (u,v) keys;
    no driver-side adjacency."""
    e = _simple_undirected(edges, src, dst)
    sym = _sym(e)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))

    # wedges centered at c: neighbors a < b
    left = sym.select(F.col("u").alias("c"), F.col("v").alias("a"))
    right = sym.select(F.col("u").alias("c"), F.col("v").alias("b"))
    wedges = left.join(right, "c").where(F.col("a") < F.col("b"))
    closed = wedges.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("b")), ["a", "b"]
    )
    tri = closed.groupBy("c").agg(F.count(F.lit(1)).alias("triangles"))

    out = (
        deg.join(tri, deg["u"] == tri["c"], "left")
        .select(
            F.col("u").alias("id"),
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
        )
        .where(F.col("degree") >= 2)
        .withColumn(
            "coefficient",
            (2.0 * F.col("triangles"))
            / (F.col("degree").cast("double") * (F.col("degree") - 1)),
        )
    )
    return out


def avg_clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> float:
    """Average of local coefficients over nodes with k ≥ 2
    (analytics.rs:478-484); 0.0 if no such node."""
    row = (
        local_clustering(edges, src, dst)
        .agg(F.avg("coefficient").alias("acc"))
        .collect()[0]
    )
    return float(row["acc"]) if row["acc"] is not None else 0.0


def top_degree_nodes(
    edges: DataFrame, top_k: int = 10, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, degree, centrality) top-k by normalized degree centrality
    degree/(n−1) (analytics.rs:209-216, 416-430); deterministic tie-break
    on id asc (the reference's partial_cmp sort is tie-unstable)."""
    e = _simple_undirected(edges, src, dst)
    deg = degrees(e, src="u", dst="v")
    n = deg.count()
    denom = float(max(n - 1, 1))
    return (
        deg.withColumn("centrality", F.col("degree").cast("double") / denom)
        .orderBy(F.desc("degree"), F.asc("id"))
        .limit(top_k)
    )


def detect_communities(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, community_id, community_size, modularity) — connected components
    as communities (analytics.rs:97-131) with the reference's per-community
    score: internal directed-adjacency entries / (2 · node_count)
    (analytics.rs:158-176 — its ``total_edges`` variable actually holds the
    node count; reproduced as-is for parity)."""
    e = _simple_undirected(edges, src, dst).cache()
    cc = connected_components(e, src="u", dst="v")
    n_nodes = cc.count()

    sym = _sym(e)
    m = cc.select(F.col("id").alias("u"), F.col("component"))
    internal = (
        sym.join(m, "u")
        .join(
            cc.select(F.col("id").alias("v"), F.col("component").alias("c2")),
            "v",
        )
        .where(F.col("component") == F.col("c2"))
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("internal_directed"))
    )
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("community_size"))
    stats = sizes.join(internal, "component", "left").select(
        "component",
        "community_size",
        (
            F.coalesce("internal_directed", F.lit(0)).cast("double")
            / F.lit(2.0 * max(n_nodes, 1))
        ).alias("modularity"),
    )
    out = cc.join(stats, "component").select(
        "id",
        F.col("component").alias("community_id"),
        "community_size",
        "modularity",
    )
    e.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """Synchronous label propagation with deterministic tie-breaks:
    each node votes over its neighbors' labels PLUS its own current label
    (the self-vote prevents the classic two-node synchronous oscillation),
    adopts the most frequent, ties → min label; converges or stops at
    ``max_iter``. Returns (id, label).

    This is the scalable community operator standing in for the
    reference's effectively-single-level Leiden (graph/leiden.rs:469-540);
    deterministic by construction (no RNG, stable tie-breaks), seedable
    runs unnecessary."""
    e = _simple_undirected(edges, src, dst)
    sym = _sym(e).localCheckpoint(eager=True)
    labels = sym.select(F.col("u").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_labels = (
            sym.join(labels.select(F.col("id").alias("v"), "label"), "v")
            .select("u", "label")
            .unionByName(labels.select(F.col("id").alias("u"), "label"))
            .groupBy(F.col("u"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("u").orderBy(F.desc("cnt"), F.asc("label"))
        new_labels = (
            nbr_labels.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("u").alias("id"), "label")
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "id")
            .where(F.col("o.label") != F.col("n.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
