"""Query-intelligence module: rerank / routing / rewriting.

Ports the reference's own unit tests (reranking/cross_encoder.rs:268-388,
query/adaptive_routing.rs:280-339, query/intelligence.rs:346-421) onto the
pure-Python rule twins, then cross-checks the Spark operators against the
twins on query batteries — the distributed expressions must agree with the
single-process semantics bit-for-bit (both sides compute in f64).
"""

from __future__ import annotations

import math

import pytest

from graphrag_rs_spark.rules.query_intelligence import (
    QueryIntelligence,
    analyze_query_complexity,
    cross_encoder_relevance,
    detect_query_type,
    rewrite_query,
)

# --- rule twins: ported reference vectors ---------------------------------


class TestCrossEncoderRules:
    def test_rerank_basic_ordering(self):
        # cross_encoder.rs:283-320 — result 3 has the best token overlap
        query = "machine learning algorithms"
        docs = {
            "1": "Machine learning is a subset of artificial intelligence",
            "2": "The weather today is sunny",
            "3": "Neural networks are machine learning algorithms used "
                 "for pattern recognition",
        }
        scores = {k: cross_encoder_relevance(query, v)
                  for k, v in docs.items()}
        ranked = sorted(scores, key=scores.get, reverse=True)
        assert ranked[0] == "3"
        assert scores["3"] > scores["2"]

    def test_score_pair_range(self):
        # cross_encoder.rs:346-359
        s = cross_encoder_relevance(
            "artificial intelligence",
            "AI and machine learning are related fields")
        assert 0.0 <= s <= 1.0

    def test_empty_sides_raw_zero(self):
        # cross_encoder.rs:112-114 early return skips the sigmoid
        assert cross_encoder_relevance("", "some doc") == 0.0
        assert cross_encoder_relevance("query", "   ") == 0.0

    def test_formula_hand_derived(self):
        # 2 distinct query tokens, 4 distinct doc tokens, overlap {"b"}:
        # jaccard = 1/5; doc has 4 raw tokens → length 0.04;
        # raw = .7/5 + .3*.04 = 0.152 → sigmoid(−5·0.348)
        got = cross_encoder_relevance("a b", "b c d e")
        raw = (1 / 5) * 0.7 + 0.04 * 0.3
        assert got == pytest.approx(1.0 / (1.0 + math.exp(-5 * (raw - 0.5))))
        assert cross_encoder_relevance("a b", "b c d e",
                                       normalize=False) == pytest.approx(raw)

    def test_case_sensitive_tokens(self):
        # split_whitespace tokens are NOT lowercased in the reference
        s_exact = cross_encoder_relevance("Spark", "Spark")
        s_cased = cross_encoder_relevance("Spark", "spark")
        assert s_exact > s_cased


class TestAdaptiveRoutingRules:
    def test_broad_query(self):
        # adaptive_routing.rs:285-297
        r = analyze_query_complexity("Give me an overview of AI technologies")
        assert r["complexity"] in ("very_broad", "broad")
        assert r["suggested_level"] >= 1

    def test_specific_query(self):
        # adaptive_routing.rs:300-311
        r = analyze_query_complexity(
            "What is the relationship between Transformers and GPT?")
        assert r["complexity"] in ("specific", "very_specific")
        assert r["suggested_level"] == 0

    def test_medium_query(self):
        # adaptive_routing.rs:314-323
        r = analyze_query_complexity("How does machine learning work?")
        assert r["suggested_level"] <= 1

    def test_detailed_scores(self):
        # adaptive_routing.rs:326-336 — contains "summarize" and "main"
        r = analyze_query_complexity("Summarize the main themes")
        assert r["keyword_score"] > 0.0

    def test_keyword_score_mean_of_matches(self):
        # 1 broad ("overview") + 1 specific ("detail") → (1−1)/2 = 0
        r = analyze_query_complexity("overview in detail")
        assert r["keyword_score"] == 0.0

    def test_entity_indicators(self):
        # two quoted phrases + one " and " → 3 indicators → −0.7
        r = analyze_query_complexity('"Alice" and "Bob"')
        assert r["entity_score"] == -0.7

    def test_level_mapping(self):
        # to_level at max_level=3: very_broad→3, broad→2, medium→1
        assert analyze_query_complexity(
            "overview summary themes")["suggested_level"] >= 2
        assert analyze_query_complexity(
            "explain how exactly the specific detail between them works "
            "and why it matters so much")["suggested_level"] == 0


class TestQueryIntelligenceRules:
    def test_query_type_detection(self):
        # intelligence.rs:350-364
        assert rewrite_query("who is the CEO of OpenAI?")["query_type"] \
            == "entity_lookup"
        assert rewrite_query("how many employees work at Google?")[
            "query_type"] == "aggregation"
        assert rewrite_query(
            "what is the relationship between Apple and Microsoft?"
        )["query_type"] == "relationship"

    def test_synonym_expansion(self):
        # intelligence.rs:367-376
        r = rewrite_query("find large companies")
        assert ("search" in r["expanded_terms"]
                or "big" in r["expanded_terms"])

    def test_stop_word_removal(self):
        # intelligence.rs:379-388
        r = rewrite_query("what is the best approach")
        assert "the" not in r["expanded_terms"]
        assert "is" not in r["expanded_terms"]

    def test_relevance_feedback(self):
        # intelligence.rs:391-400 — 0.5 →(0.9) 0.7 →(0.8) 0.75
        engine = QueryIntelligence()
        engine.record_feedback("artificial_intelligence", 0.9)
        engine.record_feedback("artificial_intelligence", 0.8)
        assert engine.get_relevance("artificial_intelligence") \
            == pytest.approx(0.75)

    def test_custom_synonyms(self):
        # intelligence.rs:403-412 — term lowered on insert, so "AI"
        # matches the lowercased query word "ai"
        engine = QueryIntelligence()
        engine.add_synonym(
            "AI", ["artificial intelligence", "machine learning"])
        r = engine.rewrite_query("AI applications")
        assert ("artificial" in r["rewritten"]
                or "machine" in r["rewritten"])

    def test_template_rewrite(self):
        # intelligence.rs:306-311 — "who is" → "entity:"
        r = rewrite_query("who is Marie Curie")
        assert r["rewritten"].startswith("entity:")

    def test_detect_type_first_match_wins(self):
        # relationship probes run before entity lookup
        assert detect_query_type(
            "what is the relationship between A and B") == "relationship"
        # "vs" matched as substring, after aggregation probes
        assert detect_query_type("cats vs dogs") == "comparison"


# --- Spark operators vs the twins ------------------------------------------

ROUTING_BATTERY = [
    "Give me an overview of AI technologies",
    "What is the relationship between Transformers and GPT?",
    "How does machine learning work?",
    "Summarize the main themes",
    'compare "Spark" and "Flink" in detail',
    "timeline",
    "why did the system fail during the deploy",
    "list all organizations",
    "",
    "   ",
    "one two three four five six seven eight nine ten eleven",
    'what are the "big picture" topics and themes overall',
]


@pytest.mark.usefixtures("spark")
class TestSparkOperators:
    def test_route_queries_matches_twin(self, spark):
        from graphrag_rs_spark.operators.query_intelligence import (
            route_queries,
        )

        df = spark.createDataFrame(
            [(q,) for q in ROUTING_BATTERY], "query string")
        got = {r["query"]: r for r in route_queries(df).collect()}
        for q in ROUTING_BATTERY:
            want = analyze_query_complexity(q)
            row = got[q]
            assert row["keyword_score"] == pytest.approx(
                want["keyword_score"]), q
            assert row["length_score"] == pytest.approx(
                want["length_score"]), q
            assert row["entity_score"] == pytest.approx(
                want["entity_score"]), q
            assert row["complexity"] == want["complexity"], q
            assert row["suggested_level"] == want["suggested_level"], q

    def test_rerank_matches_twin_and_reference_shape(self, spark):
        from graphrag_rs_spark.operators.query_intelligence import (
            rerank_cross_encoder,
            reranking_stats,
        )

        rows = [
            # cross_encoder.rs:283-320 fixture
            ("machine learning algorithms", "1",
             "Machine learning is a subset of artificial intelligence", 0.5),
            ("machine learning algorithms", "2",
             "The weather today is sunny", 0.6),
            ("machine learning algorithms", "3",
             "Neural networks are machine learning algorithms used for "
             "pattern recognition", 0.4),
            # a second query in the same batch exercises the window
            ("sunny weather", "4", "The weather today is sunny", 0.1),
            ("sunny weather", "5", "machine learning", 0.9),
        ]
        cand = spark.createDataFrame(
            rows, "query string, id string, content string, score double")
        ranked = rerank_cross_encoder(cand, top_k=3)
        by_query: dict[str, list] = {}
        for r in ranked.orderBy("query", "rank").collect():
            by_query.setdefault(r["query"], []).append(r)

        ml = by_query["machine learning algorithms"]
        assert [r["id"] for r in ml][0] == "3"
        assert ml[0]["relevance_score"] >= ml[1]["relevance_score"]
        for r in ml:
            want = cross_encoder_relevance(r["query"], r["content"])
            assert r["relevance_score"] == pytest.approx(want)
            assert r["score_delta"] == pytest.approx(
                r["relevance_score"] - r["original_score"])

        # min_confidence filters (cross_encoder.rs:323-344)
        strict = rerank_cross_encoder(cand, top_k=10, min_confidence=0.5)
        for r in strict.collect():
            assert r["relevance_score"] >= 0.5

        # stats (cross_encoder.rs:363-387): per-query counts + filter rate
        stats = {r["query"]: r
                 for r in reranking_stats(cand, strict).collect()}
        mlq = stats["machine learning algorithms"]
        assert mlq["candidates_count"] == 3
        assert mlq["results_count"] == len(
            [r for r in strict.collect()
             if r["query"] == "machine learning algorithms"])
        assert mlq["filter_rate"] == pytest.approx(
            (3 - mlq["results_count"]) / 3 * 100.0)

    def test_rewrite_queries_matches_twin(self, spark):
        from graphrag_rs_spark.operators.query_intelligence import (
            rewrite_queries,
        )

        battery = [
            "who is the CEO of OpenAI?",
            "how many employees work at Google?",
            "what is the relationship between Apple and Microsoft?",
            "find large companies",
            "what is the best approach",
            "compare spark versus flink",
            "",
        ]
        df = spark.createDataFrame([(q,) for q in battery], "query string")
        got = {r["query"]: r for r in rewrite_queries(df).collect()}
        for q in battery:
            want = rewrite_query(q)
            row = got[q]
            assert row["rewritten"] == want["rewritten"], q
            assert row["query_type"] == want["query_type"], q
            assert list(row["expanded_terms"]) == want["expanded_terms"], q
            assert row["confidence"] == pytest.approx(want["confidence"]), q

    def test_rewrite_custom_synonyms_and_feedback(self, spark):
        from graphrag_rs_spark.operators.query_intelligence import (
            rewrite_queries,
        )

        df = spark.createDataFrame([("AI applications",)], "query string")
        engine = QueryIntelligence()
        engine.add_synonym("AI", ["artificial intelligence"])
        engine.record_feedback("applications", 0.9)
        want = engine.rewrite_query("AI applications")
        row = rewrite_queries(
            df,
            synonyms={"AI": ["artificial intelligence"]},
            feedback={"applications": 0.9},
        ).collect()[0]
        assert row["rewritten"] == want["rewritten"]
        assert row["confidence"] == pytest.approx(want["confidence"])
