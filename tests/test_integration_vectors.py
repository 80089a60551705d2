"""End-to-end vectors ported from the reference's top-level integration
suite (graphrag-rs tests/integration_tests.rs), run against the real
build pipeline + query surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.plans.pipeline import build_graph


def _as_transcripts(spark, docs):
    """Each (doc_id, text) becomes a single-turn conversation in the
    engine's north-rule input shape."""
    rows = [
        (doc_id, 0, "user", text, None)
        for doc_id, text in docs
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string",
    ).withColumn("ts", F.current_timestamp())


def test_end_to_end_workflow(spark):
    # integration_tests.rs:9-49 — add two docs, build, query, non-empty
    docs = [
        (
            "doc1",
            "Machine learning is a subset of artificial intelligence. "
            "John Smith is a researcher at MIT who works on neural "
            "networks. The university is located in Cambridge, "
            "Massachusetts.",
        ),
        (
            "doc2",
            "Deep learning has applications in computer vision and "
            "natural language processing. Jane Doe leads the AI team at "
            "Google. The company is headquartered in Mountain View.",
        ),
    ]
    tables = build_graph(spark, _as_transcripts(spark, docs))
    from graphrag_rs_spark.operators.retrieval import hybrid_search

    results = hybrid_search(
        tables["chunks"].select("chunk_id", "text"),
        "machine learning research",
        id_col="chunk_id",
        top_n=5,
    ).collect()
    assert results


def test_graph_construction_stats(spark):
    # integration_tests.rs:52-85
    docs = [
        (
            "doc1",
            "Dr. Alice Johnson conducted research at Stanford University. "
            "Her work focuses on natural language processing and machine "
            "learning.",
        ),
        (
            "doc2",
            "OpenAI is an artificial intelligence company founded by Sam "
            "Altman. The organization is based in San Francisco, "
            "California.",
        ),
    ]
    tables = build_graph(spark, _as_transcripts(spark, docs))
    entity_count = tables["nodes"].count()
    assert entity_count > 0
    assert tables["documents"].count() == 2
    assert tables["chunks"].count() >= 2
    entity_types = {
        r["entity_type"]
        for r in tables["nodes"].select("entity_type").distinct().collect()
    }
    assert entity_types


def test_document_processing_pipeline(spark):
    # integration_tests.rs:110-147
    from graphrag_rs_spark.functions import clean_text_col
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.retrieval import keywords_tf

    text = (
        "This is the first sentence. This is the second sentence. "
        "This is a longer sentence that should demonstrate the chunking "
        "behavior. Finally, this is the last sentence in our test "
        "document."
    )
    docs = spark.createDataFrame(
        [("c0", "test_doc", text)],
        "conv_id string, doc_id string, full_text string",
    )
    cfg = PipelineConfig(chunk_size=200, chunk_overlap=50, chunker="fixed")
    chunks = chunk_documents(docs, cfg).collect()
    assert chunks
    for c in chunks:
        assert len(c["text"]) <= 250
        assert c["text"].strip()

    # clean_text (rs:135-136)
    cleaned = (
        spark.createDataFrame([("  This   has    extra    spaces  ",)], "t string")
        .select(clean_text_col(F.col("t")).alias("c"))
        .collect()[0]["c"]
    )
    assert cleaned == "This has extra spaces"

    # keyword extraction (rs:139-145)
    kws = keywords_tf(
        spark.createDataFrame(
            [
                (
                    "d0",
                    "machine learning artificial intelligence data "
                    "science neural networks",
                )
            ],
            "doc_id string, text string",
        ),
        max_keywords=3,
    ).collect()
    assert kws
    assert len(kws) <= 3


def test_entity_extraction_types_and_relationships(spark):
    # integration_tests.rs:150-188
    from graphrag_rs_spark.rules.extraction import (
        extract_entities,
        extract_relationships,
    )

    text = (
        "Dr. John Smith works at Microsoft Corporation in Seattle, "
        "Washington. The company was founded by Bill Gates and Paul "
        "Allen."
    )
    entities = extract_entities(text)
    assert entities
    types = {e.entity_type for e in entities}
    assert types & {"PERSON", "ORGANIZATION", "LOCATION"}
    rels = extract_relationships(entities, text)
    assert len(entities) >= 2
    assert rels


def test_vector_operations(spark):
    # integration_tests.rs:191-229
    from graphrag_rs_spark.functions import (
        cosine_similarity_col,
        euclidean_distance_col,
        unit_normalize_col,
    )
    from graphrag_rs_spark.operators.similarity_search import brute_force_knn

    corpus = spark.createDataFrame(
        [
            ("vec1", [1.0, 0.0, 0.0]),
            ("vec2", [0.0, 1.0, 0.0]),
            ("vec3", [0.8, 0.6, 0.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [("q", [1.0, 0.0, 0.0])], "query_id string, embedding array<double>"
    )
    results = brute_force_knn(corpus, qdf, k=2).collect()
    assert 0 < len(results) <= 2
    top = min(results, key=lambda r: r["rank"])
    assert top["vec_id"] == "vec1"

    row = (
        spark.createDataFrame(
            [([1.0, 0.0], [0.0, 1.0], [3.0, 4.0])],
            "a array<double>, b array<double>, v array<double>",
        )
        .select(
            cosine_similarity_col(F.col("a"), F.col("b")).alias("cos"),
            euclidean_distance_col(F.col("a"), F.col("b")).alias("dist"),
            unit_normalize_col(F.col("v")).alias("unit"),
        )
        .collect()[0]
    )
    assert row["cos"] == pytest.approx(0.0, abs=1e-3)
    assert row["dist"] == pytest.approx(2.0 ** 0.5, abs=1e-3)
    norm = sum(x * x for x in row["unit"]) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-3)

    # length-mismatch guard (rs:750-752)
    bad = (
        spark.createDataFrame(
            [([1.0, 0.0], [1.0, 0.0, 0.0])], "a array<double>, b array<double>"
        )
        .select(euclidean_distance_col(F.col("a"), F.col("b")).alias("d"))
        .collect()[0]["d"]
    )
    assert bad == float("inf")
