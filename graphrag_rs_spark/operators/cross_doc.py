"""Cross-document entity linking (graphrag-rs corpus/entity_linker.rs).

Strategies:

* ``exact_match_linking`` — group by exact name (entity_linker.rs:158-191);
  the cluster record carries canonical_name, inferred type, member count,
  document frequency and aliases. NOTE the reference stores the MEMBER
  count in its ``document_frequency`` field (rs:184:
  ``document_frequency: group_entities.len()``); we emit both that value
  (``member_count``) and the honest distinct-document count
  (``document_frequency``). Cluster ids are content-derived
  (``cluster_{xxhash64(name)}``) instead of the reference's UUIDs so
  resume/retry is deterministic (SURVEY.md §7.4 hard part 5).
* ``fuzzy`` / ``semantic`` strategies — the scalable path is the Stage-D
  canonicalizer (operators/canonicalize.py: blocking + pair scoring + CC
  + greedy replay), which subsumes entity_linker.rs:196-240's all-pairs
  loops; ``link_entities`` dispatches there.

Input contract: (doc_id, entity_id, name, entity_type?, confidence?).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_entity_type_col(name):
    """entity_linker.rs:484-497 heuristics, exactly."""
    lower = F.lower(name)
    return (
        F.when(
            lower.contains("company") | lower.contains("corp") | lower.contains("inc"),
            F.lit("organization"),
        )
        .when(
            F.substring(name, 1, 1).rlike("[A-Z]") & ~name.contains(" "),
            F.lit("person"),
        )
        .when(
            lower.contains("city") | lower.contains("country"),
            F.lit("location"),
        )
        .otherwise(F.lit("other"))
    )


def exact_match_linking(entities: DataFrame) -> DataFrame:
    """(doc_id, entity_id, name, …) → one cluster row per distinct name:
    (cluster_id, canonical_name, entity_type, member_count,
    document_frequency, aliases, confidence_score)."""
    return (
        entities.groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("member_count"),
            F.countDistinct("doc_id").alias("document_frequency"),
            F.sort_array(F.collect_set("entity_id")).alias("member_entities"),
        )
        .select(
            F.concat(F.lit("cluster_"), F.xxhash64("name").cast("string")).alias(
                "cluster_id"
            ),
            F.col("name").alias("canonical_name"),
            infer_entity_type_col(F.col("name")).alias("entity_type"),
            "member_count",
            "document_frequency",
            F.array(F.col("name")).alias("aliases"),
            F.lit(1.0).alias("confidence_score"),
            "member_entities",
        )
    )


def link_entities(
    entities: DataFrame, strategy: str = "exact", **kwargs
) -> DataFrame:
    """Strategy dispatch (entity_linker.rs:140-147). ``fuzzy`` routes to the
    distributed canonicalizer with the caller's threshold."""
    if strategy == "exact":
        return exact_match_linking(entities)
    if strategy in ("fuzzy", "semantic", "hybrid"):
        from graphrag_rs_spark.config import PipelineConfig
        from graphrag_rs_spark.operators.canonicalize import canonicalize_entities

        threshold = float(kwargs.get("threshold", 0.85))
        cfg = PipelineConfig(link_min_similarity=threshold)
        ents = entities
        if "order_key" not in ents.columns:
            # canonicalizer replays greedy clustering in first-appearance
            # order; (doc_id, 0, 0) is deterministic because the replay
            # sort tie-breaks on entity_id — no global window needed
            ents = ents.withColumn(
                "order_key",
                F.struct(
                    F.col("doc_id").alias("conv_id"),
                    F.lit(0).alias("chunk_idx"),
                    F.lit(0).alias("rank"),
                ),
            )
        if "confidence" not in ents.columns:
            ents = ents.withColumn("confidence", F.lit(1.0))
        if "entity_type" not in ents.columns:
            ents = ents.withColumn(
                "entity_type", infer_entity_type_col(F.col("name"))
            )
        return canonicalize_entities(ents, cfg)
    raise ValueError(f"unknown strategy {strategy!r}")
