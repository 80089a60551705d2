"""HippoRAG-style PPR retrieval (graphrag-rs retrieval/hipporag_ppr.rs).

The composition the reference runs per query (hipporag_ppr.rs:117-141):

1. **entity weights** from the top-k query-relevant facts — each fact's
   score flows to its subject/object entities divided by the number of
   passages the entity appears in (generic-entity downweighting), summed
   then averaged over occurrences, min-max normalized
   (hipporag_ppr.rs:146-196).
2. **passage weights** — dense-retrieval scores × ``passage_node_weight``
   (default 0.05), min-max normalized (hipporag_ppr.rs:199-216).
3. combined and sum-normalized into a reset distribution
   (hipporag_ppr.rs:219-240).
4. **personalized PageRank** over the entity+passage graph with
   HippoRAG's damping 0.5 (hipporag_ppr.rs:21-49, 243-253).
5. passages ranked by PPR score, top-k (hipporag_ppr.rs:257-296).

Every step is a DataFrame aggregation; the only driver values are the
min/max/total scalars, carried as broadcast 1-row frames (never
collected). The PPR itself is the single-action-per-iteration operator
from operators/retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.retrieval import pagerank


def _minmax_normalize(df: DataFrame, col: str) -> DataFrame:
    """min-max to [0,1]; identity when the spread is ~0
    (hipporag_ppr.rs:299-313)."""
    stats = df.agg(F.min(col).alias("_mn"), F.max(col).alias("_mx"))
    return df.crossJoin(F.broadcast(stats)).select(
        *[c for c in df.columns if c != col],
        F.when(
            F.abs(F.col("_mx") - F.col("_mn")) > 1e-10,
            (F.col(col) - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
        )
        .otherwise(F.col(col))
        .alias(col),
    )


def hipporag_retrieve(
    edges: DataFrame,
    facts: DataFrame,
    entity_passages: DataFrame,
    passage_scores: DataFrame,
    top_k_facts: int = 100,
    passage_node_weight: float = 0.05,
    min_entity_frequency: int = 1,
    normalize_scores: bool = True,
    damping: float = 0.5,
    max_iter: int = 30,
    tol: float = 1.0e-6,
    top_k_results: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Returns (passage_id, ppr_score) — the reference's ranked passages.

    * ``edges`` — the combined entity/passage graph PPR walks.
    * ``facts(subject, object, score)`` — query-relevant fact triples.
    * ``entity_passages(entity_id, passage_id)`` — membership pairs.
    * ``passage_scores(passage_id, score)`` — dense retrieval scores.
    """
    # -- step 1: entity weights from facts ------------------------------
    top_facts = facts.orderBy(F.desc("score"), "subject", "object").limit(
        top_k_facts
    )
    fact_entities = top_facts.select(
        F.explode(F.array("subject", "object")).alias("entity_id"),
        F.col("score").cast("double").alias("fact_score"),
    )
    passage_counts = entity_passages.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("num_passages")
    )
    weighted = (
        fact_entities.join(F.broadcast(passage_counts), "entity_id", "left")
        .na.fill({"num_passages": 0})
        .where(F.col("num_passages") >= min_entity_frequency)
        .select(
            "entity_id",
            F.when(
                F.col("num_passages") > 0,
                F.col("fact_score") / F.col("num_passages"),
            )
            .otherwise(F.col("fact_score"))
            .alias("w"),
        )
    )
    entity_weights = weighted.groupBy("entity_id").agg(
        (F.sum("w") / F.count(F.lit(1))).alias("weight")
    )
    if normalize_scores:
        entity_weights = _minmax_normalize(entity_weights, "weight")

    # -- step 2: passage weights ----------------------------------------
    passage_weights = passage_scores.select(
        F.col("passage_id").alias("entity_id"),
        (F.col("score").cast("double") * F.lit(passage_node_weight)).alias(
            "weight"
        ),
    )
    if normalize_scores:
        passage_weights = _minmax_normalize(passage_weights, "weight")

    # -- step 3: combined reset distribution (sum-normalized inside
    # pagerank's weighted-personalization path) -------------------------
    reset = (
        entity_weights.unionByName(passage_weights)
        .groupBy("entity_id")
        .agg(F.sum("weight").alias("weight"))
        .select(F.col("entity_id").alias("id"), "weight")
    )

    # -- step 4: PPR (damping 0.5) --------------------------------------
    ranks = pagerank(
        edges, src=src, dst=dst, damping=damping, max_iter=max_iter,
        tol=tol, personalization=reset,
    )

    # -- step 5: rank passages ------------------------------------------
    return (
        ranks.join(
            passage_scores.select(F.col("passage_id").alias("id")),
            "id",
            "left_semi",
        )
        .select(F.col("id").alias("passage_id"), F.col("rank").alias("ppr_score"))
        .orderBy(F.desc("ppr_score"), "passage_id")
        .limit(top_k_results)
    )
