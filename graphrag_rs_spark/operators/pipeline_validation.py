"""Pipeline phase validation (evaluation/pipeline_validation.rs).

The reference validates ONE document's pipeline run in memory: document
processing → entity extraction → relationship extraction → graph
construction, each phase producing named pass/fail checks, warnings and
metrics, rolled into a PipelineValidationReport. Here the same checks
run over the DISTRIBUTED pipeline tables: every per-item predicate
("no chunk is empty", "all confidences in [0,1]", "mentions reference
valid chunks") becomes a counting aggregation or an anti-join, and a
phase passes when its violation counts are zero — the corpus-wide
generalization of the reference's single-document ALL semantics
(a check that held per document holds for the corpus iff it holds for
every document).

Every validator returns the reference's PhaseValidation shape as a
plain dict: ``{phase_name, passed, checks: [{name, passed, expected,
actual, message}], warnings, metrics}``. Check names, thresholds,
warning triggers and metric keys follow pipeline_validation.rs line by
line (cited per check). Each validator costs a handful of small agg
jobs — the scans stay distributed; only scalar counts reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check(name: str, passed: bool, expected: str, actual: str,
           ok_msg: str, fail_msg: str) -> dict:
    return {
        "name": name,
        "passed": bool(passed),
        "expected": expected,
        "actual": actual,
        "message": ok_msg if passed else fail_msg,
    }


def validate_document_processing(
    documents: DataFrame,
    chunks: DataFrame,
    doc_col: str = "doc_id",
    doc_text_col: str = "full_text",
    chunk_text_col: str = "text",
    metadata_cols: tuple[str, ...] = (),
) -> dict:
    """pipeline_validation.rs:45-153 over the corpus.

    ``metadata_cols``: optional enrichment columns on ``chunks`` (e.g.
    ``("chapter", "keywords", "summary")``); a chunk counts as enriched
    when any of them is non-null/non-empty (rs:107-114).
    """
    d = documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.octet_length(F.coalesce(F.col(doc_text_col), F.lit("")))
               == 0).cast("long")).alias("empty_docs"),
    ).collect()[0]

    enriched = F.lit(False)
    for c in metadata_cols:
        if c in chunks.columns:
            col = F.col(c)
            cond = col.isNotNull()
            # array-typed metadata counts when non-empty
            if dict(chunks.dtypes).get(c, "").startswith("array"):
                cond = cond & (F.size(col) > 0)
            enriched = enriched | cond

    c_aggs = chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.trim(F.coalesce(F.col(chunk_text_col), F.lit(""))) == "")
              .cast("long")).alias("empty_chunks"),
        F.sum(F.octet_length(F.coalesce(F.col(chunk_text_col), F.lit("")))
              ).alias("chunk_chars"),
        F.sum(enriched.cast("long")).alias("enriched_chunks"),
    ).collect()[0]

    # per-document coverage (rs:77-90): every doc must reach >= 0.9
    per_doc = (
        documents.select(
            F.col(doc_col),
            F.octet_length(F.coalesce(F.col(doc_text_col), F.lit("")))
            .alias("_dlen"),
        )
        .join(
            chunks.groupBy(doc_col).agg(
                F.sum(F.octet_length(F.coalesce(F.col(chunk_text_col),
                                                F.lit("")))).alias("_clen")
            ),
            doc_col, "left",
        )
        .select(
            (F.coalesce(F.col("_clen"), F.lit(0)).cast("double")
             / F.greatest(F.col("_dlen"), F.lit(1)).cast("double")
             ).alias("coverage")
        )
        .agg(F.min("coverage").alias("min_cov"),
             F.avg("coverage").alias("avg_cov"))
        .collect()[0]
    )

    n_docs, n_chunks = int(d["n_docs"]), int(c_aggs["n_chunks"])
    empty_chunks = int(c_aggs["empty_chunks"] or 0)
    enriched_chunks = int(c_aggs["enriched_chunks"] or 0)
    min_cov = float(per_doc["min_cov"] or 0.0)
    avg_cov = float(per_doc["avg_cov"] or 0.0)
    metadata_ratio = enriched_chunks / n_chunks if n_chunks else 0.0

    checks = [
        _check("document_not_empty", int(d["empty_docs"] or 0) == 0,
               "Non-empty content", f"{int(d['empty_docs'] or 0)} empty "
               f"of {n_docs} documents",
               "Document contains content", "Document content is empty"),
        _check("chunks_created", n_chunks > 0, "At least 1 chunk",
               f"{n_chunks} chunks",
               f"Successfully created {n_chunks} chunks",
               "No chunks were created from document"),
    ]
    if n_chunks:
        checks.append(_check(
            "content_coverage", min_cov >= 0.9, "Coverage ratio >= 0.9",
            f"{min_cov:.2f}",
            f"Chunks cover {min_cov * 100.0:.1f}% of original content",
            f"Chunks cover {min_cov * 100.0:.1f}% of original content"))
    checks.append(_check(
        "no_empty_chunks", empty_chunks == 0, "0 empty chunks",
        f"{empty_chunks} empty chunks", "All chunks have content",
        f"Found {empty_chunks} empty chunks"))
    checks.append(_check(
        "metadata_enrichment", True, "Metadata enrichment (optional)",
        f"{enriched_chunks}/{n_chunks} chunks",
        f"{metadata_ratio * 100.0:.1f}% of chunks have metadata",
        ""))

    warnings = []
    if metadata_ratio < 0.5:
        warnings.append(
            f"Only {enriched_chunks}/{n_chunks} chunks have enriched "
            f"metadata ({int(metadata_ratio * 100.0)}%)")

    metrics = {
        "coverage_ratio": avg_cov,
        "metadata_ratio": metadata_ratio,
        "documents_count": float(n_docs),
        "chunks_count": float(n_chunks),
        "avg_chunk_size": (float(c_aggs["chunk_chars"] or 0)
                           / max(n_chunks, 1)),
    }
    return {
        "phase_name": "Document Processing",
        "passed": all(c["passed"] for c in checks),
        "checks": checks,
        "warnings": warnings,
        "metrics": metrics,
    }


def validate_entity_extraction(
    chunks: DataFrame,
    entities: DataFrame,
    mentions: DataFrame | None = None,
    chunk_id_col: str = "chunk_id",
    name_col: str = "name",
    type_col: str = "entity_type",
    confidence_col: str = "confidence",
    mention_chunk_col: str = "chunk_id",
) -> dict:
    """pipeline_validation.rs:160-278. ``mentions`` (entity, chunk_id)
    drives check 5 via an anti-join against chunk ids — the distributed
    form of the reference's linear scan."""
    e = entities.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col(confidence_col) < 0) | (F.col(confidence_col) > 1))
              .cast("long")).alias("bad_conf"),
        F.sum((F.coalesce(F.col(type_col), F.lit("")) == "")
              .cast("long")).alias("no_type"),
        F.sum((F.trim(F.coalesce(F.col(name_col), F.lit(""))) == "")
              .cast("long")).alias("no_name"),
        F.avg(F.col(confidence_col).cast("double")).alias("avg_conf"),
    ).collect()[0]
    n_entities = int(e["n"])

    invalid_mentions = 0
    avg_mentions = 0.0
    if mentions is not None and n_entities:
        invalid_mentions = (
            mentions.join(
                chunks.select(F.col(chunk_id_col).alias(mention_chunk_col))
                .distinct(),
                mention_chunk_col, "left_anti",
            ).count()
        )
        avg_mentions = mentions.count() / n_entities

    checks = [
        _check("entities_extracted", n_entities > 0, "At least 1 entity",
               f"{n_entities} entities",
               f"Successfully extracted {n_entities} entities",
               "No entities were extracted"),
        _check("confidence_scores_valid", int(e["bad_conf"] or 0) == 0,
               "All confidences in [0.0, 1.0]",
               f"{int(e['bad_conf'] or 0)} invalid scores",
               "All confidence scores are valid",
               f"{int(e['bad_conf'] or 0)} entities have invalid "
               "confidence scores"),
        _check("entity_types_populated", int(e["no_type"] or 0) == 0,
               "All entities have types",
               f"{int(e['no_type'] or 0)} without types",
               "All entities have types assigned",
               f"{int(e['no_type'] or 0)} entities missing entity_type"),
        _check("entity_names_valid", int(e["no_name"] or 0) == 0,
               "All entities have names",
               f"{int(e['no_name'] or 0)} empty names",
               "All entities have valid names",
               f"{int(e['no_name'] or 0)} entities have empty names"),
    ]
    warnings = []
    if mentions is not None and n_entities:
        checks.append(_check(
            "entity_mentions_valid", invalid_mentions == 0,
            "All mentions reference valid chunks",
            f"{invalid_mentions} invalid references",
            "All entity mentions are valid",
            f"{invalid_mentions} entity mentions reference non-existent "
            "chunks"))
        if invalid_mentions:
            warnings.append(
                "Some entity mentions reference non-existent chunks")

    metrics = {"entities_count": float(n_entities)}
    if n_entities:
        metrics["avg_confidence"] = float(e["avg_conf"] or 0.0)
        if mentions is not None:
            metrics["avg_mentions_per_entity"] = avg_mentions
        if metrics["avg_confidence"] < 0.5:
            warnings.append(
                f"Low average entity confidence: "
                f"{metrics['avg_confidence']:.2f}")

    return {
        "phase_name": "Entity Extraction",
        "passed": all(c["passed"] for c in checks),
        "checks": checks,
        "warnings": warnings,
        "metrics": metrics,
    }


def validate_relationship_extraction(
    entities: DataFrame,
    relationships: DataFrame,
    entity_id_col: str = "entity_id",
    source_col: str = "subj",
    target_col: str = "obj",
    rel_type_col: str = "pred",
    confidence_col: str = "confidence",
    n_entities: int | None = None,
) -> dict:
    """pipeline_validation.rs:285-388 — orphan detection is two
    anti-joins against the entity-id set instead of the reference's
    O(R·E) Vec::contains scan. Pass ``n_entities`` when the caller has
    already counted the entity table (validate_kg_pipeline does) to
    skip a redundant full scan."""
    if n_entities is None:
        n_entities = entities.count()
    r = relationships.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col(confidence_col) < 0) | (F.col(confidence_col) > 1))
              .cast("long")).alias("bad_conf"),
        F.sum((F.coalesce(F.col(rel_type_col), F.lit("")) == "")
              .cast("long")).alias("no_type"),
        F.avg(F.col(confidence_col).cast("double")).alias("avg_conf"),
    ).collect()[0]
    n_rels = int(r["n"])

    ids = entities.select(
        F.col(entity_id_col).alias("_eid")).distinct()
    orphans = (
        relationships.select(F.col(source_col).alias("_eid"))
        .join(ids, "_eid", "left_anti").count()
        + relationships.select(F.col(target_col).alias("_eid"))
        .join(ids, "_eid", "left_anti").count()
    )

    checks = []
    warnings = []
    if n_entities:
        checks.append(_check(
            "relationships_extracted", n_rels > 0,
            "At least 1 relationship", f"{n_rels} relationships",
            f"Extracted {n_rels} relationships",
            "No relationships extracted despite entities present"))
        if n_rels == 0:
            warnings.append("No relationships found between entities")
    checks.append(_check(
        "relationship_confidence_valid", int(r["bad_conf"] or 0) == 0,
        "All confidences in [0.0, 1.0]", f"{int(r['bad_conf'] or 0)} "
        "invalid", "All relationship confidences valid",
        f"{int(r['bad_conf'] or 0)} relationships have invalid "
        "confidence"))
    checks.append(_check(
        "relationship_types_populated", int(r["no_type"] or 0) == 0,
        "All relationships typed", f"{int(r['no_type'] or 0)} untyped",
        "All relationships have types",
        f"{int(r['no_type'] or 0)} relationships missing type"))
    checks.append(_check(
        "relationship_entities_exist", orphans == 0,
        "All relationships reference valid entities",
        f"{orphans} orphaned",
        "All relationships have valid entity references",
        f"{orphans} relationships reference non-existent entities"))
    if orphans:
        warnings.append("Some relationships reference entities that "
                        "don't exist in the graph")

    metrics = {"relationships_count": float(n_rels)}
    if n_entities:
        metrics["relationships_per_entity"] = n_rels / n_entities
    if n_rels:
        metrics["avg_relationship_confidence"] = float(r["avg_conf"] or 0.0)

    return {
        "phase_name": "Relationship Extraction",
        "passed": all(c["passed"] for c in checks),
        "checks": checks,
        "warnings": warnings,
        "metrics": metrics,
    }


def validate_graph_construction(documents: int, chunks: int,
                                entities: int, relationships: int) -> dict:
    """pipeline_validation.rs:395-486 — pure scalar formulas."""
    checks = [
        _check("graph_not_empty", entities > 0 or documents > 0,
               "At least some nodes",
               f"{entities} entities, {documents} docs",
               "Graph contains content", "Graph is completely empty"),
    ]
    warnings = []
    metrics = {}
    if chunks > 0:
        epc = entities / chunks
        reasonable = 0.1 <= epc <= 10.0
        checks.append(_check(
            "entity_chunk_ratio_reasonable", reasonable,
            "0.1 to 10 entities per chunk", f"{epc:.2f} entities/chunk",
            "Entity density looks reasonable",
            f"Unusual entity-to-chunk ratio: {epc:.2f}"))
        metrics["entities_per_chunk"] = epc
        if epc < 0.5:
            warnings.append(
                "Low entity density - may need better entity extraction")
        if epc > 5.0:
            warnings.append(
                "High entity density - may have duplicate extractions")
    if entities > 1:
        connectivity = relationships / entities
        checks.append(_check(
            "graph_connectivity", connectivity > 0.1,
            ">0.1 relationships per entity",
            f"{connectivity:.2f} rels/entity",
            "Graph has reasonable connectivity",
            "Graph is sparsely connected"))
        metrics["connectivity"] = connectivity
        if connectivity < 0.5:
            warnings.append(
                "Graph is sparsely connected - entities may be isolated")
    metrics.update({
        "documents": float(documents), "chunks": float(chunks),
        "entities": float(entities),
        "relationships": float(relationships),
    })
    return {
        "phase_name": "Graph Construction",
        "passed": all(c["passed"] for c in checks),
        "checks": checks,
        "warnings": warnings,
        "metrics": metrics,
    }


def pipeline_report(phases: list[dict]) -> dict:
    """PipelineValidationReport::from_phases (rs:504-534)."""
    overall = all(p["passed"] for p in phases)
    total = sum(len(p["checks"]) for p in phases)
    passed = sum(1 for p in phases for c in p["checks"] if c["passed"])
    if overall:
        summary = (f"All pipeline phases validated successfully "
                   f"({passed}/{total} checks passed)")
    else:
        failed = ", ".join(p["phase_name"] for p in phases
                           if not p["passed"])
        summary = (f"Pipeline validation failed in: {failed} "
                   f"({passed}/{total} checks passed)")
    return {
        "phases": phases,
        "overall_passed": overall,
        "total_checks": total,
        "passed_checks": passed,
        "summary": summary,
    }


def validate_kg_pipeline(
    documents: DataFrame,
    chunks: DataFrame,
    entities: DataFrame,
    edges: DataFrame,
    mentions: DataFrame | None = None,
    **col_overrides,
) -> dict:
    """Convenience end-to-end: the four phase validators over the KG
    pipeline's own stage tables, rolled into one report."""
    p_doc = validate_document_processing(
        documents, chunks,
        metadata_cols=("chapter", "keywords", "summary"))
    p_ent = validate_entity_extraction(
        chunks, entities, mentions,
        **{k: v for k, v in col_overrides.items()
           if k in ("name_col", "type_col", "confidence_col")})
    n_entities = int(p_ent["metrics"]["entities_count"])
    p_rel = validate_relationship_extraction(
        entities, edges, n_entities=n_entities,
        **{k: v for k, v in col_overrides.items()
           if k in ("entity_id_col", "source_col", "target_col",
                    "rel_type_col")})
    # the phase validators already aggregated every table once — reuse
    # their counts instead of re-scanning the four tables (4 extra full
    # count jobs at the module's target scale)
    p_graph = validate_graph_construction(
        int(p_doc["metrics"]["documents_count"]),
        int(p_doc["metrics"]["chunks_count"]),
        n_entities,
        int(p_rel["metrics"]["relationships_count"]),
    )
    return pipeline_report([p_doc, p_ent, p_rel, p_graph])
