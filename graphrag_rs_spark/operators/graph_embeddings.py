"""Graph embeddings: Node2Vec walks + skip-gram, GraphSAGE aggregation.

Port of graphrag-rs graph/embeddings.rs (public API via graph/mod.rs:40-41):

* ``EmbeddingGraph::from_edges`` (rs:77-110) → an adjacency-lists table:
  undirected (both directions inserted), weighted.
* ``Node2Vec`` (rs:132-320): biased random walks (rs:174-252) + skip-gram
  training. The reference's walk bias applies ``1/p`` to the previous
  node and ``1/q`` to EVERY other neighbor — it never checks whether the
  neighbor is shared with ``prev`` (rs:222-228, the comment says BFS/DFS
  but the code doesn't implement it); quirk preserved. Its "skip-gram"
  (rs:286-309) is a sequential global averaging pass, not SGD — order-
  dependent mutable state that cannot be replayed distributively, so the
  Spark path trains a REAL skip-gram on the same walks via
  ``pyspark.ml.feature.Word2Vec`` (JVM, scalable, negative sampling) —
  strictly stronger than the reference's simplification, same contract
  (every node → ``dimension``-length vector).
* ``GraphSAGE`` (rs:360-509): random node features, then ``num_layers``
  rounds of [sample ≤ k neighbors → mean-aggregate → (self + agg) / 2]
  (rs:397-498). Fully expressible as DataFrame joins + aggregations —
  ported exactly, with deterministic hash-based feature init and
  neighbor sampling in place of ``thread_rng`` (the reference is
  unseeded, so no bit-parity is possible; determinism here is a strict
  improvement for testability).

Scale shape: walks advance by one ``frontier ⋈ adjacency`` join per step
(the adjacency side is pre-gathered once, partitioned by node; no
collects), with lineage truncated every few steps; GraphSAGE layers are
one edge-join + hash aggregation each. Nothing touches the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adjacency_lists(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """EmbeddingGraph::from_edges (rs:77-110): undirected weighted
    adjacency, one row per node with a sorted neighbor array."""
    w = (
        F.col(weight).cast("float")
        if weight and weight in edges.columns
        else F.lit(1.0).cast("float")
    )
    fwd = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nb"), w.alias("w")
    )
    rev = edges.select(
        F.col(dst).alias("node"), F.col(src).alias("nb"), w.alias("w")
    )
    return (
        fwd.unionByName(rev)
        .groupBy("node")
        .agg(F.array_sort(F.collect_list(F.struct("nb", "w"))).alias("neighbors"))
    )


def node2vec_walks(
    adj: DataFrame,
    walk_length: int = 80,
    walks_per_node: int = 10,
    return_param: float = 1.0,
    inout_param: float = 1.0,
    seed: int = 42,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Biased random walks (rs:159-252), distributed.

    One row per walk: (walk_id, start, walk array<string>). Each step is
    one join of the active frontier against the adjacency table plus an
    Arrow-batched numpy pass doing the weighted biased choice; walks that
    hit a sink stop early (rs:187-188, 202-203). Randomness is a
    deterministic counter hash of (walk_id, step, seed) — reproducible
    across runs and partitionings, unlike the reference's thread_rng.
    """
    starts = adj.select("node").withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(walks_per_node)]))
    )
    state = starts.select(
        F.xxhash64("node", "rep", F.lit(seed)).alias("walk_id"),
        F.col("node").alias("start"),
        F.lit(None).cast("string").alias("prev"),
        F.col("node").alias("cur"),
        F.array("node").alias("walk"),
    )

    def step_fn(step: int):
        def pick(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import numpy as np
            import pandas as pd

            for pdf in batches:
                nxt = []
                for walk_id, prev, neighbors in zip(
                    pdf["walk_id"], pdf["prev"], pdf["neighbors"]
                ):
                    if neighbors is None or len(neighbors) == 0:
                        nxt.append(None)
                        continue
                    names = [n["nb"] for n in neighbors]
                    w = np.array([n["w"] for n in neighbors], dtype=np.float64)
                    if prev is None:
                        # first step: uniform (rs:192-194)
                        probs = np.ones(len(names))
                    else:
                        # rs:219-231 — 1/p back to prev, 1/q elsewhere
                        alpha = np.where(
                            np.array(names) == prev,
                            1.0 / return_param,
                            1.0 / inout_param,
                        )
                        probs = w * alpha
                    s = probs.sum()
                    if s > 0:
                        probs = probs / s
                    # deterministic uniform draw in [0, 1)
                    h = (hash((int(walk_id), step, seed)) & 0x7FFFFFFF) / float(
                        0x80000000
                    )
                    idx = int(np.searchsorted(np.cumsum(probs), h, side="left"))
                    nxt.append(names[min(idx, len(names) - 1)])
                out = pdf[["walk_id"]].copy()
                out["next"] = nxt
                yield out

        return pick

    for step in range(1, walk_length):
        frontier = state.where(F.col("cur").isNotNull())
        joined = frontier.join(
            adj, frontier["cur"] == adj["node"], "left"
        ).select("walk_id", "prev", "neighbors")
        nxt = joined.mapInPandas(
            step_fn(step), schema="walk_id long, next string"
        )
        state = (
            state.join(nxt, "walk_id", "left")
            .select(
                "walk_id",
                "start",
                F.col("cur").alias("prev"),
                F.col("next").alias("cur"),
                F.when(
                    F.col("next").isNotNull(),
                    F.concat("walk", F.array("next")),
                )
                .otherwise(F.col("walk"))
                .alias("walk"),
            )
        )
        if step % checkpoint_every == 0:
            # truncate the join-chain lineage (iterative-algorithm rule)
            state = state.localCheckpoint(eager=False)

    return state.select("walk_id", "start", "walk")


def node2vec_embeddings(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    dimension: int = 128,
    walk_length: int = 80,
    walks_per_node: int = 10,
    context_size: int = 10,
    return_param: float = 1.0,
    inout_param: float = 1.0,
    epochs: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Node2Vec end-to-end (rs:148-157): walks → skip-gram → one
    embedding row per node (node, embedding array<float>).

    The skip-gram is Spark ML's Word2Vec over the walk corpus (real
    negative-sampling SGD; the reference's rs:286-309 "update" is a toy
    averaging pass). Defaults mirror EmbeddingConfig::default (rs:46-60).
    """
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    adj = adjacency_lists(edges, src, dst, weight)
    walks = node2vec_walks(
        adj,
        walk_length=walk_length,
        walks_per_node=walks_per_node,
        return_param=return_param,
        inout_param=inout_param,
        seed=seed,
    )
    w2v = Word2Vec(
        vectorSize=dimension,
        windowSize=context_size,
        minCount=0,
        maxIter=epochs,
        seed=seed,
        inputCol="walk",
        outputCol="_vec",
    )
    model = w2v.fit(walks.select("walk"))
    vectors = model.getVectors()  # (word, vector: VectorUDT)
    return vectors.select(
        F.col("word").alias("node"),
        vector_to_array(F.col("vector"), "float32").alias("embedding"),
    )


def _hash_unit_floats(*cols, n: int, lo: float = 0.0, hi: float = 1.0):
    """n deterministic floats in [lo, hi) from a counter hash of cols."""
    return F.array(
        *[
            (
                (F.pmod(F.xxhash64(*cols, F.lit(i)), F.lit(1_000_000)) / 1_000_000.0)
                * (hi - lo)
                + lo
            ).cast("float")
            for i in range(n)
        ]
    )


def graphsage_embeddings(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dimension: int = 128,
    num_layers: int = 2,
    samples_per_layer: tuple[int, ...] = (25, 10),
    features: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """GraphSAGE mean-aggregation embeddings (rs:375-498).

    Exactly the reference's simplified inductive pass: features start
    random in [0,1) (rs:380-385; here a deterministic hash of (node,
    seed, i) — the reference is unseeded), then per layer every node
    samples ≤ ``samples_per_layer[layer]`` neighbors (deterministic
    hash-ranked in place of rs:408-422's rng), mean-aggregates their
    features (rs:448-462; missing layers default to 10 samples, rs:389),
    and combines ``(self + agg) / 2`` elementwise (rs:486-498). Nodes
    with no neighbors aggregate the zero vector (rs:443-445).

    Pass ``features`` (node, features array<float>) to seed with real
    node features instead — the inductive use the rs TODO points at.

    Plan: one edge-join + one hash aggregation per layer; the per-node
    neighbor cap is a row_number window over the edge list. No collects.
    """
    from pyspark.sql import Window

    und = edges.select(F.col(src).alias("node"), F.col(dst).alias("nb")).unionByName(
        edges.select(F.col(dst).alias("node"), F.col(src).alias("nb"))
    ).distinct()
    nodes = und.select("node").distinct()

    if features is None:
        feats = nodes.select(
            "node",
            _hash_unit_floats(F.col("node"), F.lit(seed), n=dimension).alias(
                "features"
            ),
        )
    else:
        # the reference graph is built FROM edges (rs:77-110): nodes
        # without an edge do not exist in it, so extra feature rows drop
        feats = features.select(
            "node", F.col("features").cast("array<float>")
        ).join(nodes, "node", "left_semi")

    zeros = F.array(*[F.lit(0.0).cast("float")] * dimension)

    for layer in range(num_layers):
        k = (
            samples_per_layer[layer]
            if layer < len(samples_per_layer)
            else 10  # rs:389 unwrap_or(10)
        )
        w = Window.partitionBy("node").orderBy(
            F.xxhash64("node", "nb", F.lit(seed), F.lit(layer))
        )
        sampled = (
            und.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k)
            .drop("_rk")
        )
        nb_feats = sampled.join(
            feats.select(F.col("node").alias("nb"), F.col("features").alias("_nf")),
            "nb",
        )
        agg = (
            nb_feats.groupBy("node")
            .agg(
                F.aggregate(
                    F.collect_list("_nf"),
                    F.expr(f"array_repeat(cast(0.0 as double), {dimension})"),
                    lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                ).alias("_sum"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "node",
                F.transform("_sum", lambda v: v / F.col("_n")).alias("_agg"),
            )
        )
        feats = (
            feats.join(agg, "node", "left")
            .select(
                "node",
                F.zip_with(
                    "features",
                    F.coalesce(F.col("_agg").cast("array<float>"), zeros),
                    lambda a, b: ((a + b) / F.lit(2.0)).cast("float"),
                ).alias("features"),
            )
            .localCheckpoint(eager=False)
        )

    return feats.select("node", F.col("features").alias("embedding"))
