"""Integration vectors ported from the reference's hybrid retrieval
suite (graphrag-rs tests/hybrid_retrieval_tests.rs) — the Tom Sawyer
fixture graph, query-analysis classifications, result dedup, confidence
ordering, and empty-query handling, run against this engine's
adaptive-retrieval twin + hybrid_search operator.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rules.adaptive import analyze_query

# hybrid_retrieval_tests.rs:13-63 fixture
ENTITY_NAMES = ["Tom Sawyer", "Huck Finn"]
CHUNKS = [
    ("chunk1", "Tom Sawyer was a clever boy who lived with his Aunt Polly."),
    (
        "chunk2",
        "Huck Finn was Tom's best friend and they had many adventures "
        "together.",
    ),
]


class TestQueryAnalysisVectors:
    """hybrid_retrieval_tests.rs:85-123 (analyze_query on the fixture)."""

    def test_entity_focused(self):
        a = analyze_query("Tom Sawyer", ENTITY_NAMES)
        assert a["query_type"] == "entity_focused"
        assert "Tom Sawyer" in a["key_entities"]

    def test_relationship(self):
        a = analyze_query("Tom and Huck friendship", ENTITY_NAMES)
        assert a["query_type"] == "relationship"
        assert a["key_entities"]

    def test_exploratory(self):
        a = analyze_query("what is the main theme", ENTITY_NAMES)
        assert a["query_type"] == "exploratory"

    def test_overview_intent(self):
        a = analyze_query("overview of the story", ENTITY_NAMES)
        assert a["intent"] == "overview"

    def test_detailed_intent(self):
        a = analyze_query("detailed description of events", ENTITY_NAMES)
        assert a["intent"] == "detailed"

    def test_strategy_weights_distinct_types(self):
        # rs:204-233 — the three probe queries classify differently
        entity = analyze_query("Tom Sawyer", ENTITY_NAMES)
        relationship = analyze_query("Tom and Huck friendship", ENTITY_NAMES)
        conceptual = analyze_query("what is the story about", ENTITY_NAMES)
        assert conceptual["query_type"] in ("conceptual", "exploratory")
        assert entity["query_type"] != relationship["query_type"]
        assert entity["query_type"] != conceptual["query_type"]


@pytest.fixture()
def chunk_df(spark):
    return spark.createDataFrame(CHUNKS, "doc_id string, text string")


class TestHybridQueryVectors:
    def test_result_deduplication(self, spark, chunk_df):
        # rs:235-268 — result ids unique within each query's result set
        from graphrag_rs_spark.operators.retrieval import hybrid_search

        for query in ("Tom Sawyer", "Tom character"):
            rows = hybrid_search(chunk_df, query, top_n=10).collect()
            ids = [r["item_id"] for r in rows]
            assert len(ids) == len(set(ids)), query
            assert rows, query

    def test_confidence_scoring(self, spark, chunk_df):
        # rs:270-298 — a specific entity query's best score is not worse
        # than 0.8× a general concept query's best score
        from graphrag_rs_spark.operators.retrieval import hybrid_search

        specific = hybrid_search(chunk_df, "Tom Sawyer", top_n=10).collect()
        general = hybrid_search(chunk_df, "character", top_n=10).collect()
        assert specific and general
        max_specific = max(r["rrf_score"] for r in specific)
        max_general = max(r["rrf_score"] for r in general)
        assert max_specific >= max_general * 0.8

    def test_empty_query_handling(self, spark, chunk_df):
        # rs:361-380 — empty/whitespace queries must not error
        from graphrag_rs_spark.operators.retrieval import hybrid_search

        for query in ("", "   "):
            rows = hybrid_search(chunk_df, query, top_n=5).collect()
            assert len(rows) <= 5
