"""Entity ↔ chunk bidirectional index analytics
(graphrag-rs entity/bidirectional_index.rs).

The reference materializes two in-memory HashMaps (entity→chunks,
chunk→entities) and answers lookups and analytics over them. On Spark the
index IS the mentions relation — a distinct (entity_id, chunk_id) table —
and every accessor becomes a declarative aggregation over it, so the
"index" needs no build step, scales with the mentions table, and inherits
partition pruning from the parquet scan.

Semantics ported (file:line cites into /root/reference):

* ``co_occurring_entities`` — bidirectional_index.rs:291-309: for each
  entity, every other entity sharing a chunk, counted once per shared chunk
  (the rust maps are duplicate-free: add_mapping guards containment,
  rs:93-107 — hence the distinct() projection here).
* ``common_entities`` — rs:315-331: entities in ≥ min_chunk_count chunks,
  chunk-count desc (ties broken by entity_id; the reference leaves ties in
  HashMap order).
* ``dense_chunks`` — rs:337-353: chunks with ≥ min_entity_count entities.
* ``index_statistics`` — rs:368-388: totals + average fan-outs.

Input contract: (entity_id, chunk_id) — extra columns are ignored. The
kg_mentions stage table (operators/extraction.py) satisfies it directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mappings(df: DataFrame) -> DataFrame:
    return df.select("entity_id", "chunk_id").distinct()


def co_occurring_entities(
    mentions: DataFrame, entity_id: str | None = None
) -> DataFrame:
    """(entity_id, other_entity_id, shared_chunks) for every co-occurring
    pair — rs:291-309 generalized to all entities in one self-join; pass
    ``entity_id`` to restrict to one entity (filter pushes below the join).
    """
    m = _mappings(mentions)
    a, b = m.alias("a"), m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.chunk_id") == F.col("b.chunk_id"))
        & (F.col("a.entity_id") != F.col("b.entity_id")),
    ).select(
        F.col("a.entity_id").alias("entity_id"),
        F.col("b.entity_id").alias("other_entity_id"),
    )
    if entity_id is not None:
        pairs = pairs.where(F.col("entity_id") == entity_id)
    return pairs.groupBy("entity_id", "other_entity_id").agg(
        F.count(F.lit(1)).alias("shared_chunks")
    )


def common_entities(mentions: DataFrame, min_chunk_count: int = 2) -> DataFrame:
    """Entities appearing in ≥ min_chunk_count chunks, desc — rs:315-331."""
    return (
        _mappings(mentions)
        .groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("chunk_count"))
        .where(F.col("chunk_count") >= min_chunk_count)
        .orderBy(F.desc("chunk_count"), F.asc("entity_id"))
    )


def dense_chunks(mentions: DataFrame, min_entity_count: int = 2) -> DataFrame:
    """Chunks containing ≥ min_entity_count entities, desc — rs:337-353."""
    return (
        _mappings(mentions)
        .groupBy("chunk_id")
        .agg(F.count(F.lit(1)).alias("entity_count"))
        .where(F.col("entity_count") >= min_entity_count)
        .orderBy(F.desc("entity_count"), F.asc("chunk_id"))
    )


def index_statistics(mentions: DataFrame) -> DataFrame:
    """One-row IndexStatistics — rs:368-388, 399-417."""
    m = _mappings(mentions)
    row = m.agg(
        F.countDistinct("entity_id").alias("total_entities"),
        F.countDistinct("chunk_id").alias("total_chunks"),
        F.count(F.lit(1)).alias("total_mappings"),
    )
    ents = F.col("total_entities").cast("double")
    chunks = F.col("total_chunks").cast("double")
    maps = F.col("total_mappings").cast("double")
    return row.select(
        "total_entities",
        "total_chunks",
        "total_mappings",
        F.when(ents > 0, maps / ents).otherwise(F.lit(0.0)).alias(
            "avg_chunks_per_entity"
        ),
        F.when(chunks > 0, maps / chunks).otherwise(F.lit(0.0)).alias(
            "avg_entities_per_chunk"
        ),
    )
