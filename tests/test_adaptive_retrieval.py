"""Adaptive retrieval: rule-twin vectors + Spark parity.

Pins analyze_query / weight tables / fusion+diversity against
hand-derived vectors from retrieval/mod.rs:600-905 and
retrieval/adaptive.rs:55-298, then cross-checks the distributed
operators against the twins over query batteries.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rules.adaptive import (
    Candidate,
    analyze_query,
    calculate_strategy_weights,
    cross_strategy_fusion,
    diversity_aware_selection,
    select_strategy_weights,
)

ENTITY_NAMES = ["Alice", "Bob Smith", "Quantum Lab", "Tesla"]


class TestAnalyzeTwin:
    def test_relationship_two_entities(self):
        r = analyze_query("how do alice and tesla interact", ENTITY_NAMES)
        assert r["key_entities"] == ["Alice", "Tesla"]
        assert r["query_type"] == "relationship"

    def test_entity_focused_single(self):
        r = analyze_query("tell me about tesla motors", ENTITY_NAMES)
        assert r["key_entities"] == ["Tesla"]
        assert r["query_type"] == "entity_focused"
        # "about" → overview intent (mod.rs:643-646)
        assert r["intent"] == "overview"

    def test_conceptual_and_exploratory_and_factual(self):
        assert analyze_query("the theory holds", [])["query_type"] \
            == "conceptual"
        assert analyze_query("explain gravity", [])["query_type"] \
            == "exploratory"
        assert analyze_query("paris population 2024", [])["query_type"] \
            == "factual"

    def test_concepts_exclude_stopwords_and_entities(self):
        r = analyze_query("explain quantum lab experiments", ENTITY_NAMES)
        # "quantum lab" matched as entity (word "quantum" ⊂ name);
        # "explain" (7>3, not stop, not in entity) and "experiments" kept;
        # "lab" len 3 → dropped
        assert r["key_entities"] == ["Quantum Lab"]
        assert "experiments" in r["concepts"]
        assert "quantum" not in r["concepts"]
        assert "lab" not in r["concepts"]

    def test_complexity_formula(self):
        # 4 words, 1 entity, concepts: "tell"? stopword list lacks
        # "tell" → concepts = words >3 not stop not entity-overlap
        r = analyze_query("tell me about tesla", ENTITY_NAMES)
        n_concepts = len(r["concepts"])
        want = min(4 * 0.1 + 1 * 0.3 + n_concepts * 0.2, 1.0)
        assert r["complexity_score"] == pytest.approx(want)
        # saturation at 1.0
        long_q = " ".join(f"concept{i}" for i in range(12))
        assert analyze_query(long_q, [])["complexity_score"] == 1.0

    def test_intent_ladder_order(self):
        # "why" is both a question word and causal; type checks first
        # abstract→conceptual? no — causal intent, exploratory type
        r = analyze_query("why compare them", [])
        assert r["intent"] == "comparative"  # comparative probes first
        r2 = analyze_query("why did it happen", [])
        assert r2["intent"] == "causal"


class TestWeightTwins:
    def test_mod_rs_table(self):
        assert calculate_strategy_weights("entity_focused", "detailed") \
            == (0.5, 0.4, 0.1)
        assert calculate_strategy_weights("relationship", "overview") \
            == (0.3, 0.6, 0.1)
        assert calculate_strategy_weights("conceptual", "overview") \
            == (0.2, 0.2, 0.6)
        assert calculate_strategy_weights("conceptual", "causal") \
            == (0.4, 0.3, 0.3)
        assert calculate_strategy_weights("exploratory", "overview") \
            == (0.3, 0.2, 0.5)
        assert calculate_strategy_weights("exploratory", "detailed") \
            == (0.4, 0.4, 0.2)
        assert calculate_strategy_weights("factual", "temporal") \
            == (0.6, 0.3, 0.1)

    def test_adaptive_rs_table_and_gate(self):
        # adaptive.rs:55-87 tables; confidence gate at 0.6
        assert select_strategy_weights("entity_focused", 0.8) \
            == (0.2, 0.5, 0.2, 0.1)
        assert select_strategy_weights("factual", 0.61) \
            == (0.2, 0.1, 0.1, 0.6)
        # low confidence → balanced complex weights regardless of type
        assert select_strategy_weights("entity_focused", 0.59) \
            == (0.25, 0.25, 0.25, 0.25)


class TestFusionTwins:
    def test_dedupe_keeps_higher_score(self):
        # adaptive.rs:229-244 — the higher copy replaces, and moves to
        # the back of encounter order before the sort
        cands = [
            Candidate("a", 0.5, ("E1",)),
            Candidate("b", 0.9, ("E2",)),
            Candidate("a", 0.7, ("E3",)),
        ]
        out = cross_strategy_fusion(cands, 10)
        assert [c.id for c in out] == ["b", "a"]
        assert out[1].score == 0.7
        assert out[1].entities == ("E3",)

    def test_diversity_selection_rules(self):
        # max_results=4 → first 2 always admitted (len < max//2);
        # then: score>0.8 OR new entity required
        ranked = [
            Candidate("r1", 0.95, ("E1",)),
            Candidate("r2", 0.85, ("E1",)),
            Candidate("r3", 0.5, ("E1",)),   # no new entity, low → skip
            Candidate("r4", 0.4, ("E2",)),   # new entity → keep
            Candidate("r5", 0.3, ("E2",)),   # skipped in pass 1...
        ]
        out = diversity_aware_selection(ranked, 4)
        # pass 1: r1, r2 (slots <2), r4 (new E2) — r3, r5 skipped;
        # backfill: r3 re-added in rank order
        assert [c.id for c in out] == ["r1", "r2", "r4", "r3"]

    def test_backfill_respects_cap(self):
        ranked = [Candidate(f"r{i}", 0.1 * i, ()) for i in range(8)]
        out = diversity_aware_selection(ranked, 3)
        assert len(out) == 3


@pytest.mark.usefixtures("spark")
class TestSparkOperators:
    QUERIES = [
        "how do alice and tesla interact",
        "tell me about tesla motors",
        "the theory holds",
        "explain gravity",
        "paris population 2024",
        "explain quantum lab experiments",
        "why did it happen",
    ]

    def test_analyze_queries_matches_twin(self, spark):
        from graphrag_rs_spark.operators.adaptive_retrieval import (
            analyze_queries,
        )

        q = spark.createDataFrame([(x,) for x in self.QUERIES],
                                  "query string")
        ents = spark.createDataFrame([(n,) for n in ENTITY_NAMES],
                                     "name string")
        got = {r["query"]: r for r in analyze_queries(q, ents).collect()}
        for query in self.QUERIES:
            want = analyze_query(query, ENTITY_NAMES)
            row = got[query]
            assert sorted(row["key_entities"]) == sorted(
                want["key_entities"]), query
            assert list(row["concepts"]) == want["concepts"], query
            assert row["query_type"] == want["query_type"], query
            assert row["intent"] == want["intent"], query
            assert row["complexity_score"] == pytest.approx(
                want["complexity_score"]), query

    def test_weight_ladders_match_twins(self, spark):
        from graphrag_rs_spark.operators.adaptive_retrieval import (
            adaptive_strategy_weights,
            analyze_queries,
            strategy_weights,
        )

        q = spark.createDataFrame([(x,) for x in self.QUERIES],
                                  "query string")
        ents = spark.createDataFrame([(n,) for n in ENTITY_NAMES],
                                     "name string")
        analyzed = analyze_queries(q, ents)
        with_mod = {r["query"]: r
                    for r in strategy_weights(analyzed).collect()}
        with_adp = {r["query"]: r for r in
                    adaptive_strategy_weights(analyzed).collect()}
        for query in self.QUERIES:
            want = analyze_query(query, ENTITY_NAMES)
            v, g, h = calculate_strategy_weights(
                want["query_type"], want["intent"])
            row = with_mod[query]
            assert (row["vector_weight"], row["graph_weight"],
                    row["hierarchical_weight"]) == (v, g, h), query
            av, ag, ah, ab = select_strategy_weights(
                want["query_type"], want["complexity_score"])
            arow = with_adp[query]
            assert (arow["vector_weight"], arow["graph_weight"],
                    arow["hierarchical_weight"], arow["bm25_weight"]) \
                == (av, ag, ah, ab), query

    def test_fuse_adaptive_matches_twin(self, spark):
        from graphrag_rs_spark.operators.adaptive_retrieval import (
            fuse_adaptive,
        )

        rows = [
            ("q1", "a", 0.5, ["E1"], 1),
            ("q1", "b", 0.9, ["E2"], 2),
            ("q1", "a", 0.7, ["E3"], 3),
            ("q1", "c", 0.3, ["E2"], 4),
            ("q1", "d", 0.2, ["E4"], 5),
            ("q2", "x", 0.99, ["Z"], 1),
        ]
        df = spark.createDataFrame(
            rows,
            "query string, id string, score double, "
            "entities array<string>, _ord long")
        got = {}
        for r in fuse_adaptive(df, max_results=3).collect():
            got.setdefault(r["query"], []).append(
                (r["final_rank"], r["id"], r["score"]))
        for k in got:
            got[k] = [x[1:] for x in sorted(got[k])]

        # twin candidates in _ord order
        q1 = [Candidate(r[1], r[2], tuple(r[3]))
              for r in sorted([r for r in rows if r[0] == "q1"],
                              key=lambda r: r[4])]
        want = [(c.id, c.score) for c in cross_strategy_fusion(q1, 3)]
        assert got["q1"] == want
        assert got["q2"] == [("x", 0.99)]

    def test_fuse_adaptive_multi_entity_and_null_arrays(self, spark):
        # entities arrays arrive in applyInPandas as numpy arrays: a
        # 2+ element array made `r[col] or ()` raise the ambiguous-truth
        # ValueError; NULL arrays must degrade to () like the twin
        from graphrag_rs_spark.operators.adaptive_retrieval import (
            fuse_adaptive,
        )

        rows = [
            ("q1", "a", 0.9, ["E1", "E2", "E3"], 1),
            ("q1", "b", 0.8, None, 2),
            ("q1", "c", 0.7, ["E1", "E2"], 3),
            ("q1", "d", 0.6, [], 4),
        ]
        df = spark.createDataFrame(
            rows,
            "query string, id string, score double, "
            "entities array<string>, _ord long")
        got = sorted(
            (r["final_rank"], r["id"], tuple(r["entities"]))
            for r in fuse_adaptive(df, max_results=4).collect()
        )
        twin = [
            Candidate(r[1], r[2], tuple(r[3] or ())) for r in rows
        ]
        want = sorted(
            (i + 1, c.id, tuple(c.entities))
            for i, c in enumerate(cross_strategy_fusion(twin, 4))
        )
        assert got == want
        assert got[0][2] == ("E1", "E2", "E3")

    def test_analyze_queries_blank_query_matches_twin(self, spark):
        # "" / whitespace queries: Python "".split() == [] so the twin
        # finds no entities and types the query factual; the JVM path
        # must not tokenize [""] (contains("") matches every name)
        from graphrag_rs_spark.operators.adaptive_retrieval import (
            analyze_queries,
        )

        q = spark.createDataFrame([("",), ("   ",)], "query string")
        ents = spark.createDataFrame([(n,) for n in ENTITY_NAMES],
                                     "name string")
        got = {r["query"]: r for r in analyze_queries(q, ents).collect()}
        for query in ("", "   "):
            want = analyze_query(query, ENTITY_NAMES)
            assert want["key_entities"] == []
            assert list(got[query]["key_entities"]) == []
            assert got[query]["query_type"] == want["query_type"] == "factual"
            assert got[query]["complexity_score"] == pytest.approx(0.0)
