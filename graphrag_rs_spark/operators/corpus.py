"""Corpus-level knowledge graph (graphrag-rs corpus/knowledge_graph.rs +
collection_processor.rs).

The reference's ``CorpusKnowledgeGraph`` aggregates entity clusters into
*global entities*, derives document-level co-occurrence *global relations*,
and publishes corpus statistics. All of it is re-expressed as declarative
DataFrame aggregations — no driver-side loops, so the same plan holds at
10^12-turn scale (the per-document relation self-join shuffles once on
``doc_id`` and is bounded by per-document entity counts, not corpus size).

Semantics ported (file:line cites into /root/reference):

* ``global_entities`` — knowledge_graph.rs:150-185 ``create_global_entity``:
  total_mentions = member count, aliases = distinct member names,
  source_documents = distinct doc ids; importance score per rs:277-290:
  ``(0.4*(ln(df)+1) + 0.3*(ln(mentions)+1) + 0.3*spread) / 3`` where
  ``spread`` = number of distinct source documents (identical to df in the
  reference — both derive from the same member set; we keep the formula
  literal).
* ``corpus_relations`` — knowledge_graph.rs:188-255: one ``co_occurs``
  relation per unordered cluster pair sharing a document; confidence starts
  at 0.7 and gains +0.1 per additional shared document, capped at 1.0
  (rs:224,246); document_frequency counts shared documents. The reference's
  pair orientation follows HashMap iteration order (non-deterministic run to
  run); we orient pairs lexicographically by cluster id so output is stable.
* ``corpus_graph_stats`` — knowledge_graph.rs:293-332 ``update_statistics``
  including the reference's *simplified* largest-component = node count
  (rs:324-332, reproduced deliberately; the honest figure is available via
  operators/graph.py connected components).
* ``corpus_query`` / ``top_entities`` / ``entities_by_type`` /
  ``cross_document_entities`` — knowledge_graph.rs:346-413.
* ``corpus_stats`` — collection_processor.rs:59-103 incl. the quality
  metrics weighting (0.3 entity + 0.3 relation + 0.4 consistency).

Input contract: a *cluster members* DataFrame with columns
(cluster_id, canonical_name, entity_type, doc_id, entity_id, name,
confidence) — one row per member entity, e.g. the canonicalizer output
joined back to raw entities, or cross_doc.exact_match_linking members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_entities(members: DataFrame) -> DataFrame:
    """Cluster members → one global-entity row per cluster.

    Returns (entity_id, canonical_name, entity_type, document_frequency,
    total_mentions, aliases, source_documents, confidence_score,
    importance_score) — knowledge_graph.rs:14-25 field for field
    (``properties`` is carried by the workspace tables, not here).
    """
    agg = members.groupBy("cluster_id", "canonical_name", "entity_type").agg(
        F.count(F.lit(1)).alias("total_mentions"),
        F.countDistinct("doc_id").alias("document_frequency"),
        F.sort_array(F.collect_set("name")).alias("aliases"),
        F.sort_array(F.collect_set("doc_id")).alias("source_documents"),
        F.max("confidence").alias("confidence_score"),
    )
    # knowledge_graph.rs:277-290 — weighted combination / 3
    importance = (
        (F.log(F.col("document_frequency").cast("double")) + F.lit(1.0)) * 0.4
        + (F.log(F.col("total_mentions").cast("double")) + F.lit(1.0)) * 0.3
        + F.size("source_documents").cast("double") * 0.3
    ) / F.lit(3.0)
    return agg.select(
        F.col("cluster_id").alias("entity_id"),
        "canonical_name",
        "entity_type",
        "document_frequency",
        "total_mentions",
        "aliases",
        "source_documents",
        "confidence_score",
        importance.alias("importance_score"),
    )


def corpus_relations(members: DataFrame) -> DataFrame:
    """Document-level co-occurrence relations between clusters.

    knowledge_graph.rs:188-255: for every document, every unordered pair of
    distinct clusters present in it yields/strengthens one ``co_occurs``
    relation. Expressed as a distinct (doc, cluster) projection self-joined
    on ``doc_id`` — one shuffle, map-side pair dedupe, no driver loop.
    """
    doc_clusters = members.select("doc_id", "cluster_id").distinct()
    a = doc_clusters.alias("a")
    b = doc_clusters.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.cluster_id") < F.col("b.cluster_id")),
    ).select(
        F.col("a.cluster_id").alias("source_entity_id"),
        F.col("b.cluster_id").alias("target_entity_id"),
        F.col("a.doc_id").alias("doc_id"),
    )
    agg = pairs.groupBy("source_entity_id", "target_entity_id").agg(
        F.countDistinct("doc_id").alias("document_frequency"),
        F.sort_array(F.collect_set("doc_id")).alias("source_documents"),
    )
    # rs:224 starts at 0.7; rs:246 adds 0.1 per extra document, min(1.0)
    confidence = F.least(
        F.lit(0.7) + (F.col("document_frequency") - 1).cast("double") * 0.1,
        F.lit(1.0),
    )
    return agg.select(
        F.concat_ws("_", "source_entity_id", "target_entity_id").alias("id"),
        "source_entity_id",
        "target_entity_id",
        F.lit("co_occurs").alias("relation_type"),
        confidence.alias("confidence"),
        "document_frequency",
        "source_documents",
    )


def corpus_graph_stats(entities: DataFrame, relations: DataFrame) -> DataFrame:
    """One-row GraphStats (knowledge_graph.rs:293-332).

    ``largest_component_size`` reproduces the reference's declared
    simplification (rs:324-332 returns ``node_count``).
    """
    e = entities.agg(
        F.count(F.lit(1)).alias("total_entities"),
        F.sum((F.col("document_frequency") > 1).cast("long")).alias(
            "cross_document_entities"
        ),
        F.sum((F.col("document_frequency") <= 1).cast("long")).alias(
            "single_document_entities"
        ),
    )
    r = relations.agg(F.count(F.lit(1)).alias("total_relations"))
    row = e.crossJoin(r)
    n = F.col("total_entities").cast("double")
    rels = F.col("total_relations").cast("double")
    return row.select(
        "total_entities",
        "total_relations",
        F.coalesce("cross_document_entities", F.lit(0)).alias(
            "cross_document_entities"
        ),
        F.coalesce("single_document_entities", F.lit(0)).alias(
            "single_document_entities"
        ),
        F.when(n > 0, rels * 2.0 / n).otherwise(F.lit(0.0)).alias(
            "avg_entity_connections"
        ),
        F.when(n > 1, rels / (n * (n - 1) / 2.0))
        .otherwise(F.lit(0.0))
        .alias("graph_density"),
        F.col("total_entities").alias("largest_component_size"),
    )


def corpus_query(entities: DataFrame, query: str) -> DataFrame:
    """Substring match on canonical name or any alias, importance-desc
    (knowledge_graph.rs:346-368). Ties broken by entity_id for stable
    output (the reference leaves ties in HashMap order)."""
    q = query.lower()
    hit = F.lower(F.col("canonical_name")).contains(q) | F.exists(
        "aliases", lambda a: F.lower(a).contains(q)
    )
    return entities.where(hit).orderBy(
        F.desc("importance_score"), F.asc("entity_id")
    )


def top_entities(entities: DataFrame, limit: int) -> DataFrame:
    """knowledge_graph.rs:402-406."""
    return entities.orderBy(
        F.desc("importance_score"), F.asc("entity_id")
    ).limit(limit)


def entities_by_type(entities: DataFrame, entity_type: str) -> DataFrame:
    """knowledge_graph.rs:395-399."""
    return entities.where(F.col("entity_type") == entity_type)


def cross_document_entities(entities: DataFrame) -> DataFrame:
    """knowledge_graph.rs:409-413."""
    return entities.where(F.col("document_frequency") > 1)


def corpus_stats(
    members: DataFrame,
    entities: DataFrame,
    relations: DataFrame,
    raw_relation_count: int | None = None,
) -> DataFrame:
    """One-row CorpusStats + QualityMetrics
    (collection_processor.rs:36-103).

    ``total_entities_extracted`` is the raw member count (pre-linking);
    ``total_relations_extracted`` defaults to the corpus relation count when
    the caller has no separate raw figure. Quality weighting per rs:99-102:
    0.3*entity_conf + 0.3*relation_conf + 0.4*cross_doc_consistency.
    """
    m = members.agg(
        F.countDistinct("doc_id").alias("documents_processed"),
        F.count(F.lit(1)).alias("total_entities_extracted"),
    )
    e = entities.agg(
        F.count(F.lit(1)).alias("unique_entities_after_linking"),
        F.sum((F.col("document_frequency") > 1).cast("long")).alias(
            "_cross_doc"
        ),
        F.avg("confidence_score").alias("entity_confidence_avg"),
    )
    r = relations.agg(
        F.count(F.lit(1)).alias("total_relations_extracted"),
        F.avg("confidence").alias("relation_confidence_avg"),
    )
    row = m.crossJoin(e).crossJoin(r)
    if raw_relation_count is not None:
        row = row.withColumn(
            "total_relations_extracted", F.lit(raw_relation_count)
        )
    docs = F.col("documents_processed").cast("double")
    raw_e = F.col("total_entities_extracted").cast("double")
    ratio = F.when(
        raw_e > 0, F.coalesce("_cross_doc", F.lit(0)).cast("double") / raw_e
    ).otherwise(F.lit(0.0))
    e_conf = F.coalesce("entity_confidence_avg", F.lit(0.0))
    r_conf = F.coalesce("relation_confidence_avg", F.lit(0.0))
    return row.select(
        "documents_processed",
        "total_entities_extracted",
        "total_relations_extracted",
        "unique_entities_after_linking",
        ratio.alias("cross_document_entity_ratio"),
        F.when(docs > 0, raw_e / docs).otherwise(F.lit(0.0)).alias(
            "avg_entities_per_document"
        ),
        F.when(
            docs > 0, F.col("total_relations_extracted").cast("double") / docs
        )
        .otherwise(F.lit(0.0))
        .alias("avg_relations_per_document"),
        e_conf.alias("entity_confidence_avg"),
        r_conf.alias("relation_confidence_avg"),
        ratio.alias("cross_document_consistency"),
        (e_conf * 0.3 + r_conf * 0.3 + ratio * 0.4).alias(
            "overall_quality_score"
        ),
    )
