"""Implicit relationship inference as distributed dataflow
(graphrag-rs inference.rs:53-413; scoring rules in rules/inference.py).

The reference's ``InferenceEngine::infer_relationships`` is a per-target
driver loop over the whole in-memory chunk store (inference.rs:83-137):
collect chunks containing the target, score every co-occurring entity in
each, normalize by the target's chunk count, threshold, sort, truncate.

Spark shape (batched — one job infers for MANY targets at once, the
single-target call is the degenerate case):

1. targets broadcast-joined onto chunks via ``array_contains`` — the
   target list is query input (bounded), the chunk table is the big side
   and is never collected;
2. ``explode(entity_ids)`` → one (chunk, target, candidate) row per
   co-occurring entity (inference.rs:105-114);
3. evidence scoring in ONE Arrow-batched ``mapInPandas`` pass over the
   exploded rows (string rules, no shuffle);
4. per-target chunk counts + per-candidate score sums are two hash
   aggregations with map-side partial combine; normalization and the
   confidence gate are JVM expressions (inference.rs:117-129);
5. top-k per target via a ranking window (inference.rs:133-135) — ties
   broken by candidate id ascending for determinism (the reference's
   sort on equal f32 confidences is order-undefined).

At 100 TB: the only shuffles are the two aggregations and the final
per-target window, all keyed by (target, candidate) / target — no
all-pairs stage, no driver-side loop.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MIN_CONFIDENCE = 0.3  # InferenceConfig::default, inference.rs:39-45
DEFAULT_MAX_CANDIDATES = 10
_SCORE_SCHEMA = (
    "target_id string, relation_type string, candidate_id string, "
    "chunk_id string, score double"
)


def _score_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    from graphrag_rs_spark.rules.inference import calculate_evidence_score

    for pdf in batches:
        scores = [
            calculate_evidence_score(text or "", target, cand)
            for text, target, cand in zip(
                pdf["text"], pdf["target_id"], pdf["candidate_id"]
            )
        ]
        yield pd.DataFrame(
            {
                "target_id": pdf["target_id"],
                "relation_type": pdf["relation_type"],
                "candidate_id": pdf["candidate_id"],
                "chunk_id": pdf["chunk_id"],
                "score": scores,
            }
        )


def infer_relationships_batch(
    chunks: DataFrame,
    targets: DataFrame,
    min_confidence: float = DEFAULT_MIN_CONFIDENCE,
    max_candidates: int = DEFAULT_MAX_CANDIDATES,
) -> DataFrame:
    """Infer implicit relations for every (target_id, relation_type) row.

    ``chunks``: (chunk_id, text, entity_ids array<string>).
    Returns (source, target, relation_type, confidence, evidence_count)
    — the InferredRelation row (inference.rs:11-21), ranked and truncated
    per target.
    """
    target_chunks = chunks.join(
        F.broadcast(targets),
        F.array_contains(chunks["entity_ids"], targets["target_id"]),
    )

    # evidence_count = number of chunks containing the target — the SAME
    # for every candidate of that (target, relation) query
    # (inference.rs:120-128); keyed by both so a target queried under two
    # relation types counts each query's chunks once
    per_target = target_chunks.groupBy("target_id", "relation_type").agg(
        F.count("*").alias("evidence_count")
    )

    pairs = target_chunks.select(
        "target_id",
        "relation_type",
        "chunk_id",
        "text",
        F.explode("entity_ids").alias("candidate_id"),
    ).where(F.col("candidate_id") != F.col("target_id"))

    scored = pairs.select(
        "target_id", "relation_type", "candidate_id", "chunk_id", "text"
    ).mapInPandas(_score_batches, schema=_SCORE_SCHEMA)

    summed = scored.groupBy("target_id", "relation_type", "candidate_id").agg(
        F.sum("score").alias("score_sum")
    )

    normalized = (
        summed.join(F.broadcast(per_target), ["target_id", "relation_type"])
        .withColumn(
            "confidence",
            F.least(F.col("score_sum") / F.col("evidence_count"), F.lit(1.0)),
        )
        .where(F.col("confidence") >= F.lit(min_confidence))
    )

    ranked = normalized.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("target_id", "relation_type").orderBy(
                F.col("confidence").desc(), F.col("candidate_id").asc()
            )
        ),
    ).where(F.col("rank") <= max_candidates)

    return ranked.select(
        F.col("target_id").alias("source"),
        F.col("candidate_id").alias("target"),
        "relation_type",
        "confidence",
        "evidence_count",
    )


def infer_relationships(
    chunks: DataFrame,
    target_entity: str,
    relation_type: str,
    min_confidence: float = DEFAULT_MIN_CONFIDENCE,
    max_candidates: int = DEFAULT_MAX_CANDIDATES,
) -> DataFrame:
    """Single-target convenience matching the reference call shape
    (inference.rs:83-87)."""
    spark = chunks.sparkSession
    targets = spark.createDataFrame(
        [(target_entity, relation_type)], "target_id string, relation_type string"
    )
    return infer_relationships_batch(
        chunks, targets, min_confidence=min_confidence, max_candidates=max_candidates
    )


def find_entities_by_name(nodes: DataFrame, name: str) -> DataFrame:
    """Case-insensitive substring entity lookup (inference.rs:404-412).
    The reference returns the FIRST match in insertion order; distributed
    tables have no insertion order, so callers get all matches ordered by
    id — ``.limit(1)`` reproduces the Option<&Entity> shape."""
    return nodes.where(
        F.col("name").isNotNull()
        & F.lower(F.col("name")).contains(name.lower())
    ).orderBy("cluster_id")
