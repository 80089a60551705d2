"""Graph traversal as iterative DataFrame joins
(graphrag-rs graph/traversal.rs semantics, distributed).

* ``bfs_distances`` — (multi-source) BFS layer expansion: distances from
  any seed, depth-bounded (traversal.rs:85-141 single source;
  traversal.rs:322-386 multi-source — same frontier algorithm with a
  seeded frontier of several roots).
* ``ego_network`` — the k-hop neighborhood node set with hop distance and
  the induced edge set (traversal.rs:248-320).
* ``k_hop_neighbors`` — neighbors at exactly/at-most k hops, the
  ``Neighbors{max_hops}`` query operator (query/optimizer.rs:40-47).

Edges with confidence below ``min_strength`` are dropped before traversal
(TraversalConfig.min_relationship_strength gate, traversal.rs:121-124).
Each frontier iteration is one join + anti-join; frontiers are
localCheckpointed to cut lineage — the standard Spark shape for iterative
graph expansion. Depth is bounded by ``max_depth`` so the loop count is a
config constant, not data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym_edges(
    edges: DataFrame,
    src: str,
    dst: str,
    confidence: str | None,
    min_strength: float,
) -> DataFrame:
    e = edges
    if confidence is not None and confidence in edges.columns:
        e = e.where(F.col(confidence) >= min_strength)
    e = e.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def bfs_distances(
    edges: DataFrame,
    sources: "list[str] | DataFrame",
    max_depth: int = 3,
    src: str = "subj",
    dst: str = "obj",
    confidence: str | None = "confidence",
    min_strength: float = 0.0,
) -> DataFrame:
    """(id, distance) for every node within ``max_depth`` hops of any
    source (distance = hops from the nearest source; sources at 0).

    ``sources`` may be a Python list (small seed sets) or a single-column
    ``id`` DataFrame (seed sets too large to pass through the driver)."""
    spark = edges.sparkSession
    sym = _sym_edges(edges, src, dst, confidence, min_strength).localCheckpoint(
        eager=True
    )
    if isinstance(sources, DataFrame):
        seeds = sources.select(F.col(sources.columns[0]).alias("id")).distinct()
    else:
        seeds = spark.createDataFrame(
            [(s,) for s in sources], "id string"
        ).distinct()
    visited = seeds.withColumn("distance", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited

    for depth in range(1, max_depth + 1):
        nxt = (
            sym.join(frontier.select(F.col("id").alias("u")), "u")
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("distance", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def k_hop_neighbors(
    edges: DataFrame,
    sources: list[str],
    k: int,
    src: str = "subj",
    dst: str = "obj",
    exact: bool = False,
) -> DataFrame:
    """Nodes reachable within (or, with ``exact=True``, at exactly) ``k``
    hops of the sources, excluding the sources themselves —
    ``QueryOp::Neighbors{max_hops}`` (query/optimizer.rs:40-47)."""
    d = bfs_distances(
        edges, sources, max_depth=k, src=src, dst=dst, confidence=None
    )
    cond = (F.col("distance") == k) if exact else (F.col("distance") > 0)
    return d.where(cond)


def all_paths(
    edges: DataFrame,
    source: str,
    target: str,
    max_depth: int = 3,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """All simple paths source → target up to ``max_depth`` hops
    (traversal.rs:388-518: depth-bounded DFS with a visited set) —
    distributed as frontier expansion carrying the path array; cycles are
    pruned with ``array_contains``. Returns (path array<string>, length).

    Depth is a config constant so the join count is bounded; path
    enumeration is inherently exponential in dense graphs — keep
    ``max_depth`` small exactly as the reference's TraversalConfig does.
    """
    spark = edges.sparkSession
    sym = _sym_edges(edges, src, dst, None, 0.0).localCheckpoint(eager=True)

    frontier = spark.createDataFrame(
        [(source, [source])], "node string, path array<string>"
    )
    results = spark.createDataFrame([], "path array<string>, length int")
    for depth in range(1, max_depth + 1):
        stepped = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .where(~F.array_contains(F.col("path"), F.col("v")))
            .select(
                F.col("v").alias("node"),
                F.concat(F.col("path"), F.array(F.col("v"))).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        done = stepped.where(F.col("node") == target).select(
            "path", F.lit(depth).cast("int").alias("length")
        )
        results = results.unionByName(done)
        frontier = stepped.where(F.col("node") != target)
        if frontier.isEmpty():
            break
    return results


def ego_network(
    edges: DataFrame,
    ego: str,
    k_hops: int = 2,
    src: str = "subj",
    dst: str = "obj",
    confidence: str | None = "confidence",
    min_strength: float = 0.0,
) -> tuple[DataFrame, DataFrame]:
    """(nodes, induced_edges) of the k-hop ego neighborhood
    (traversal.rs:248-320): nodes carry hop distance; the edge set is the
    original edge rows whose BOTH endpoints fall inside the neighborhood."""
    nodes = bfs_distances(
        edges, [ego], max_depth=k_hops, src=src, dst=dst,
        confidence=confidence, min_strength=min_strength,
    )
    member = nodes.select("id")
    induced = (
        edges.join(member.withColumnRenamed("id", src), src, "left_semi")
        .join(member.withColumnRenamed("id", dst), dst, "left_semi")
    )
    return nodes, induced


def query_focused_subgraph(
    edges: DataFrame,
    seed_entities: list[str],
    expansion_hops: int = 2,
    src: str = "subj",
    dst: str = "obj",
    confidence: str | None = "confidence",
    min_strength: float = 0.0,
) -> tuple[DataFrame, DataFrame]:
    """Union of per-seed ego networks (traversal.rs:521-566): nodes carry
    the MINIMUM distance over seeds; an edge belongs to the subgraph iff
    BOTH endpoints fall inside the SAME seed's neighborhood (the reference
    unions per-seed induced edge sets, so a cross-neighborhood edge between
    two different seeds' fringes is excluded).

    One seed-LABELED BFS covers all seeds simultaneously — the frontier
    carries (seed, id) pairs, so |seeds| ego walks cost one iterative join
    loop, not |seeds| loops.
    """
    spark = edges.sparkSession
    sym = _sym_edges(edges, src, dst, confidence, min_strength).localCheckpoint(
        eager=True
    )
    seeds = spark.createDataFrame(
        [(s, s) for s in dict.fromkeys(seed_entities)], "seed string, id string"
    )
    visited = seeds.withColumn("distance", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited

    for depth in range(1, expansion_hops + 1):
        nxt = (
            sym.join(
                frontier.select("seed", F.col("id").alias("u")), "u"
            )
            .select("seed", F.col("v").alias("id"))
            .distinct()
            .join(visited.select("seed", "id"), ["seed", "id"], "left_anti")
            .withColumn("distance", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt

    nodes = visited.groupBy("id").agg(F.min("distance").alias("distance"))
    membership = visited.select("seed", "id")
    induced = (
        edges.join(
            membership.select("seed", F.col("id").alias(src)), src
        )
        .join(
            membership.select(
                F.col("seed").alias("_s2"), F.col("id").alias(dst)
            ),
            dst,
        )
        .where(F.col("seed") == F.col("_s2"))
        .drop("seed", "_s2")
        .distinct()
    )
    return nodes, induced
