"""Pipeline phase validation: reference vectors + distributed checks.

Ports the reference's unit tests (evaluation/pipeline_validation.rs:
598-680) onto the Spark validators and pins each check's pass/fail
trigger with targeted violations.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.pipeline_validation import (
    pipeline_report,
    validate_document_processing,
    validate_entity_extraction,
    validate_graph_construction,
    validate_kg_pipeline,
    validate_relationship_extraction,
)


def _checks(phase):
    return {c["name"]: c for c in phase["checks"]}


@pytest.mark.usefixtures("spark")
class TestDocumentProcessing:
    def test_reference_vector_passes(self, spark):
        # pipeline_validation.rs:601-629 — two chunks covering the doc
        docs = spark.createDataFrame(
            [("test", "This is test content with multiple words.")],
            "doc_id string, full_text string")
        chunks = spark.createDataFrame(
            [("c1", "test", "This is test"),
             ("c2", "test", "content with multiple words.")],
            "chunk_id string, doc_id string, text string")
        v = validate_document_processing(docs, chunks)
        assert v["passed"]
        assert all(c["passed"] for c in v["checks"])
        assert v["metrics"]["chunks_count"] == 2.0

    def test_violations_trip_the_right_checks(self, spark):
        docs = spark.createDataFrame(
            [("d1", "0123456789" * 10), ("d2", "")],
            "doc_id string, full_text string")
        chunks = spark.createDataFrame(
            [("c1", "d1", "0123456789"),  # 10% coverage of d1
             ("c2", "d1", "   ")],        # whitespace-only chunk
            "chunk_id string, doc_id string, text string")
        v = validate_document_processing(docs, chunks)
        ch = _checks(v)
        assert not ch["document_not_empty"]["passed"]   # d2 empty
        assert not ch["content_coverage"]["passed"]     # min cov < 0.9
        assert not ch["no_empty_chunks"]["passed"]      # c2 blank
        assert ch["metadata_enrichment"]["passed"]      # always passes
        assert not v["passed"]
        assert any("enriched metadata" in w for w in v["warnings"])

    def test_metadata_cols_counted(self, spark):
        docs = spark.createDataFrame(
            [("d1", "alpha beta")], "doc_id string, full_text string")
        chunks = spark.createDataFrame(
            [("c1", "d1", "alpha beta", "Ch1", ["k"]),
             ("c2", "d1", "alpha beta", None, [])],
            "chunk_id string, doc_id string, text string, "
            "chapter string, keywords array<string>")
        v = validate_document_processing(
            docs, chunks, metadata_cols=("chapter", "keywords"))
        assert v["metrics"]["metadata_ratio"] == pytest.approx(0.5)


@pytest.mark.usefixtures("spark")
class TestEntityAndRelationshipPhases:
    def test_reference_entity_vector_passes(self, spark):
        # pipeline_validation.rs:631-656
        chunks = spark.createDataFrame(
            [("c1", "test", "Alice works at Stanford")],
            "chunk_id string, doc_id string, text string")
        entities = spark.createDataFrame(
            [("e1", "Alice", "person", 0.9)],
            "entity_id string, name string, entity_type string, "
            "confidence double")
        v = validate_entity_extraction(chunks, entities)
        assert v["passed"]

    def test_entity_violations(self, spark):
        chunks = spark.createDataFrame(
            [("c1", "d", "text")],
            "chunk_id string, doc_id string, text string")
        entities = spark.createDataFrame(
            [("e1", "Alice", "person", -0.7),  # bad confidence (<0)
             ("e2", "  ", "", 0.2)],           # empty name + type
            "entity_id string, name string, entity_type string, "
            "confidence double")
        mentions = spark.createDataFrame(
            [("e1", "c1"), ("e2", "GHOST")],
            "entity_id string, chunk_id string")
        v = validate_entity_extraction(chunks, entities, mentions)
        ch = _checks(v)
        assert not ch["confidence_scores_valid"]["passed"]
        assert not ch["entity_types_populated"]["passed"]
        assert not ch["entity_names_valid"]["passed"]
        assert not ch["entity_mentions_valid"]["passed"]
        assert v["metrics"]["avg_mentions_per_entity"] == 1.0
        assert any("Low average entity confidence" in w
                   for w in v["warnings"])

    def test_relationship_checks_and_orphans(self, spark):
        entities = spark.createDataFrame(
            [("A",), ("B",)], "entity_id string")
        rels = spark.createDataFrame(
            [("A", "knows", "B", 0.9),
             ("A", "", "GHOST", 1.5)],  # orphan target, untyped, bad conf
            "subj string, pred string, obj string, confidence double")
        v = validate_relationship_extraction(entities, rels)
        ch = _checks(v)
        assert ch["relationships_extracted"]["passed"]
        assert not ch["relationship_confidence_valid"]["passed"]
        assert not ch["relationship_types_populated"]["passed"]
        assert not ch["relationship_entities_exist"]["passed"]
        assert "1 orphaned" in ch["relationship_entities_exist"]["actual"]
        assert v["metrics"]["relationships_per_entity"] == 1.0

    def test_no_relationships_warns(self, spark):
        entities = spark.createDataFrame([("A",)], "entity_id string")
        rels = spark.createDataFrame(
            [], "subj string, pred string, obj string, confidence double")
        v = validate_relationship_extraction(entities, rels)
        assert not _checks(v)["relationships_extracted"]["passed"]
        assert "No relationships found between entities" in v["warnings"]


class TestGraphConstructionAndReport:
    def test_graph_construction_thresholds(self):
        # rs:395-486: 10 docs/50 chunks/100 entities/60 rels → all pass
        v = validate_graph_construction(10, 50, 100, 60)
        assert v["passed"]
        assert v["metrics"]["entities_per_chunk"] == pytest.approx(2.0)
        assert v["metrics"]["connectivity"] == pytest.approx(0.6)
        # sparse graph: connectivity 0.05 < 0.1 fails
        sparse = validate_graph_construction(1, 10, 100, 5)
        assert not _checks(sparse)["graph_connectivity"]["passed"]
        assert any("sparsely connected" in w for w in sparse["warnings"])
        # dense extraction warning
        dense = validate_graph_construction(1, 10, 80, 80)
        assert any("duplicate extractions" in w for w in dense["warnings"])
        # empty graph
        empty = validate_graph_construction(0, 0, 0, 0)
        assert not empty["passed"]

    def test_pipeline_report_rollup(self):
        # rs:658-680
        phase = {
            "phase_name": "Test Phase", "passed": True,
            "checks": [{"name": "test_check", "passed": True,
                        "expected": "pass", "actual": "pass",
                        "message": "OK"}],
            "warnings": [], "metrics": {},
        }
        report = pipeline_report([phase])
        assert report["overall_passed"]
        assert report["total_checks"] == 1
        assert report["passed_checks"] == 1
        failing = dict(phase, passed=False, phase_name="Bad Phase",
                       checks=[dict(phase["checks"][0], passed=False)])
        report2 = pipeline_report([phase, failing])
        assert not report2["overall_passed"]
        assert "Bad Phase" in report2["summary"]
        assert report2["passed_checks"] == 1
        assert report2["total_checks"] == 2


@pytest.mark.usefixtures("spark")
class TestEndToEnd:
    def test_validate_kg_pipeline_consistent_tables(self, spark):
        docs = spark.createDataFrame(
            [("d1", "Alice met Bob. Bob knows Carol.")],
            "doc_id string, full_text string")
        chunks = spark.createDataFrame(
            [("c1", "d1", "Alice met Bob."),
             ("c2", "d1", " Bob knows Carol.")],
            "chunk_id string, doc_id string, text string")
        entities = spark.createDataFrame(
            [("PERSON_alice", "Alice", "person", 0.9),
             ("PERSON_bob", "Bob", "person", 0.9),
             ("PERSON_carol", "Carol", "person", 0.8)],
            "entity_id string, name string, entity_type string, "
            "confidence double")
        edges = spark.createDataFrame(
            [("PERSON_alice", "met", "PERSON_bob", 0.7),
             ("PERSON_bob", "knows", "PERSON_carol", 0.7)],
            "subj string, pred string, obj string, confidence double")
        report = validate_kg_pipeline(docs, chunks, entities, edges)
        assert report["overall_passed"], report["summary"]
        assert report["passed_checks"] == report["total_checks"]
        assert [p["phase_name"] for p in report["phases"]] == [
            "Document Processing", "Entity Extraction",
            "Relationship Extraction", "Graph Construction"]
