"""ROGRAG query-processing: ported reference vectors + Spark operators.

Reference tests live in graphrag-core/src/rograg/ (intent_classifier.rs:
688-798, logic_form.rs:950-1059, decomposer.rs:760-815,
fuzzy_matcher.rs:826-934) — but ``rograg`` is NOT a default cargo
feature (Cargo.toml:13,56), so that test module never runs in the
reference's own CI, and several of its assertions are mathematically
impossible against the implementation (e.g. "What is X?" scores 0.25
under calculate_intent_score's 0.5·keyword-fraction + 0.5·regex-fraction
formula while the test asserts > 0.5; the semantic decomposer's patterns
are case-SENSITIVE so "How is..." never matches). We port the
IMPLEMENTATION faithfully — that is what a user compiling with the
feature gets — and pin HAND-DERIVED vectors from its actual scoring
math, noting each divergence from the aspirational rs test inline.
"""

from __future__ import annotations

import math

import pytest

from graphrag_rs_spark.rules.rograg import (
    classify_clause,
    classify_intent,
    decompose_hybrid,
    decompose_semantic,
    decompose_syntactic,
    extract_clauses,
    fuzzy_containment,
    fuzzy_jaccard,
    fuzzy_levenshtein_sim,
    fuzzy_overall_confidence,
    fuzzy_text_similarity,
    logic_name_similarity,
    parse_logic_form,
    query_complexity,
    suggest_reformulation,
    word_overlap,
)


# ---------------------------------------------------------------------------
# Intent classification — intent_classifier.rs:688-798 test mod
# ---------------------------------------------------------------------------


class TestIntentClassifier:
    def test_factual_intent(self):
        # rs test (694-701) asserts confidence > 0.5 — impossible under
        # the implementation: Factual = 1/4 keywords ("what") · 0.5 +
        # 1/4 regexes · 0.5 = 0.25. Pin the real math.
        r = classify_intent("What is Entity Name?")
        assert r.primary_intent == "Factual"
        assert r.confidence == pytest.approx(0.25)
        assert r.should_refuse  # 0.25 < refusal_threshold 0.8 (rs:508)

    def test_definitional_intent(self):
        # "define" keyword (1/5·0.5) + \bdefine\b regex (1/5·0.5) = 0.2
        r = classify_intent("Define the concept of friendship")
        assert r.primary_intent == "Definitional"
        assert r.confidence == pytest.approx(0.2)

    def test_relational_intent(self):
        # "related" keyword (1/5·0.5) + "how ... related to" regex
        # (1/4·0.5) = 0.225
        r = classify_intent("How is Entity Name related to Second Entity?")
        assert r.primary_intent == "Relational"
        assert r.confidence == pytest.approx(0.225)

    def test_temporal_intent(self):
        # "when" (1/7·0.5) + "when did" regex (1/5·0.5) = 0.171428
        r = classify_intent("When did Entity Name main activity?")
        assert r.primary_intent == "Temporal"
        assert r.confidence == pytest.approx(1 / 14 + 0.1)

    def test_causal_intent(self):
        # "why" (1/6·0.5) + "why did" regex (1/5·0.5) = 0.183333
        r = classify_intent("Why did Entity Name trick his friends?")
        assert r.primary_intent == "Causal"
        assert r.confidence == pytest.approx(1 / 12 + 0.1)

    def test_comparative_query_scores_relational_first(self):
        # rs test (743-751) asserts Comparative — but the implementation
        # scores Relational HIGHER on "Compare X and Y": Relational gets
        # the "and" keyword (1/5·0.5) plus the \w+ and \w+ regex
        # (1/4·0.5) = 0.225, while Comparative gets "compare" (1/7·0.5)
        # + one regex (1/5·0.5) = 0.171. Not ambiguous (0.171 < 0.8·0.225
        # = 0.18 by a hair). Pin the implementation.
        r = classify_intent("Compare Entity Name and Second Entity")
        assert r.primary_intent == "Relational"
        assert r.confidence == pytest.approx(0.225)
        assert ("Comparative", pytest.approx(0.1 + 1 / 14)) in [
            (i, pytest.approx(s)) for i, s in r.secondary_intents
        ] or r.secondary_intents[0][0] == "Comparative"

    def test_summary_intent(self):
        # "tell me about" (1/5·0.5) + regex (1/5·0.5) = 0.2
        r = classify_intent("Tell me about Entity Name")
        assert r.primary_intent == "Summary"
        assert r.confidence == pytest.approx(0.2)

    def test_ambiguous_query(self):
        # rs:763-771
        r = classify_intent("something unclear")
        assert r.primary_intent == "Ambiguous" or r.confidence < 0.5

    def test_complexity_calculation(self):
        # rs:773-782
        simple = classify_intent("What is Tom?")
        complex_ = classify_intent(
            "What is the intricate relationship between Entity Name and "
            "Second Entity, and how does it evolve throughout their "
            "various adventures and escapades?"
        )
        assert complex_.complexity_score > simple.complexity_score

    def test_reformulation_suggestions(self):
        # rs:784-797 — refusal_threshold 0.9 to force a suggestion
        r = classify_intent("tell me about stuff", refusal_threshold=0.9)
        assert r.suggested_reformulation is not None

    def test_inappropriate_refusal(self):
        # intent_classifier.rs:453-464
        r = classify_intent("tell me about violence in the novel")
        assert r.primary_intent == "Inappropriate"
        assert r.should_refuse
        assert r.confidence == 1.0

    def test_complexity_hand_derived(self):
        # calculate_complexity rs:576-592 on "what is tom?":
        # words=3, sentences=1, alpha=9 → avg_word_len=3
        # 0.3*(3/20) + 0.2*(1/3) + 0.2*(3/8) + 0 = 0.186667
        assert math.isclose(
            query_complexity("what is tom?"), 0.186667, abs_tol=1e-4
        )

    def test_reformulation_ladder_order(self):
        # rs:595-614: first-match ladder
        assert suggest_reformulation("tell me about X and Y").startswith(
            "Try asking a more specific"
        )
        assert suggest_reformulation("X and Y?").startswith("Try breaking")
        long_q = " ".join(["word"] * 21) + "?"
        assert suggest_reformulation(long_q).startswith("Try using a shorter")
        assert suggest_reformulation("what").startswith("Try phrasing")
        assert suggest_reformulation("what?").startswith("Try being more")


# ---------------------------------------------------------------------------
# Logic forms — logic_form.rs:950-1059 test mod
# ---------------------------------------------------------------------------


class TestLogicForm:
    def test_pattern_parser_what_is(self):
        # rs:984-996 asserts the capture is "Entity Name" — but the
        # pattern's tail is GREEDY `(.+)\??` in both the regex crate and
        # Python, so the trailing '?' stays inside the capture. Pin the
        # implementation's actual capture (quirk preserved).
        lf = parse_logic_form("What is Entity Name?")
        assert lf is not None
        assert lf.predicate == "Is"
        assert len(lf.arguments) == 1
        assert lf.arguments[0][1] == "Entity Name?"

    def test_pattern_parser_no_question_mark(self):
        # without the trailing '?' the capture is clean — this is the
        # form the executor can actually resolve by containment
        lf = parse_logic_form("What is Entity Name")
        assert lf.arguments[0] == ("X", "Entity Name")

    def test_pattern_parser_related(self):
        # rs:997-1006
        lf = parse_logic_form("How is Entity Name related to Second Entity?")
        assert lf is not None
        assert lf.predicate == "Related"
        assert len(lf.arguments) == 2
        assert lf.arguments[0] == ("X", "Entity Name")

    def test_parser_who_is(self):
        lf = parse_logic_form("Who is Tom Sawyer?")
        assert lf is not None and lf.predicate == "Is"

    def test_parser_when_happened(self):
        lf = parse_logic_form("When did the flood happen?")
        assert lf is not None
        assert lf.predicate == "Happened"
        assert lf.arguments[0] == ("X", "the flood")

    def test_parser_why_caused(self):
        lf = parse_logic_form("Why did the storm cause the delay?")
        assert lf is not None
        assert lf.predicate == "Caused"
        # greedy tail keeps the '?' in the LAST capture (quirk preserved)
        assert lf.arguments == [("X", "the storm"), ("Y", "the delay?")]

    def test_parser_compare(self):
        lf = parse_logic_form("Compare Tom and Huck")
        assert lf is not None
        assert lf.predicate == "Compare"
        assert lf.arguments[0] == ("X", "Tom")

    def test_parser_unparseable(self):
        assert parse_logic_form("gibberish without structure") is None

    def test_parse_confidence_default(self):
        # rs:541: pattern parses carry confidence 0.8
        assert parse_logic_form("What is X?").confidence == 0.8

    def test_name_similarity(self):
        # rs:1048-1059
        assert logic_name_similarity("Entity Name", "Entity Name") == 1.0
        assert logic_name_similarity("Entity", "Entity Name") > 0.5
        assert (
            logic_name_similarity("Completely Different", "Entity Name") < 0.5
        )

    def test_name_similarity_word_jaccard(self):
        # rs:769-779: disjoint containment falls to word Jaccard
        # "tom sawyer" vs "huck sawyer": inter=1, union=3
        assert math.isclose(
            logic_name_similarity("tom sawyer", "huck sawyer"), 1 / 3
        )


# ---------------------------------------------------------------------------
# Decomposition — decomposer.rs:760-815 test mod
# ---------------------------------------------------------------------------


class TestDecomposer:
    def test_semantic_decomposition(self):
        # rs:765-778 feeds "How is ... related to ...?" — but the
        # decomposer's patterns are case-SENSITIVE (no (?i), unlike the
        # logic-form parser's), so the capitalized form never matches.
        # Lowercase matches and yields 3 subqueries at conf 0.8; the
        # greedy (.+) keeps the trailing '?' in the second capture.
        d = decompose_semantic("how is tom related to huck?")
        assert len(d.subqueries) == 3
        assert d.confidence == 0.8
        assert d.subqueries[0].text == "What is tom"
        assert d.subqueries[1].text == "What is huck?"
        assert d.subqueries[2].text == "How are tom and huck? related"
        assert d.subqueries[1].dependencies == ["sem_0"]

    def test_semantic_case_sensitivity_quirk(self):
        # capitalized "How is..." falls through every pattern AND the
        # conjunction fallback (no bare "and"/"or"/"but" substring) →
        # single query at confidence 1.0
        d = decompose_semantic("How is Tom related to Huck?")
        assert len(d.subqueries) == 1
        assert d.confidence == 1.0

    def test_semantic_who_what_pattern(self):
        d = decompose_semantic("who is Tom and what is the raft?")
        assert d.confidence == 0.8
        assert d.subqueries[0].text == "who is Tom"

    def test_semantic_conjunction_fallback(self):
        # rs:402-426: no pattern → split on first conjunction, conf 0.5
        d = decompose_semantic("the river rose or the town flooded")
        assert d.confidence == 0.5
        assert [s.text for s in d.subqueries] == [
            "the river rose",
            "the town flooded",
        ]

    def test_syntactic_decomposition(self):
        # rs:780-792
        d = decompose_syntactic(
            "What is Tom, and how does he know Huck; also describe the raft"
        )
        assert len(d.subqueries) > 1
        assert d.confidence == 0.7

    def test_syntactic_single_clause(self):
        d = decompose_syntactic("What is Tom?")
        assert len(d.subqueries) == 1
        assert d.confidence == 1.0
        assert d.strategy_used == "None"

    def test_hybrid_prefers_semantic(self):
        # rs:794-805 (lowercase — see case-sensitivity quirk above)
        d = decompose_hybrid("how is tom related to huck?")
        assert d.strategy_used == "Hybrid"
        assert len(d.subqueries) == 3

    def test_hybrid_falls_to_syntactic(self):
        d = decompose_hybrid("describe the raft, describe the river")
        assert d.strategy_used == "Hybrid"
        assert len(d.subqueries) == 2

    def test_single_query_fallback(self):
        # rs:807-814
        d = decompose_hybrid("Simple query")
        assert len(d.subqueries) == 1
        assert d.confidence == 1.0

    def test_clause_type_classification(self):
        # rs:555-573
        assert classify_clause("who is Tom") == "Entity"
        assert classify_clause("what is the raft") == "Definitional"
        assert classify_clause("when did it happen") == "Temporal"
        assert classify_clause("why it sank because of rocks") == "Causal"
        assert classify_clause("their connection runs deep") == "Relationship"
        assert classify_clause("tom versus huck") == "Comparative"
        assert classify_clause("the raft's size") == "Attribute"

    def test_clause_substring_quirk(self):
        # separators match as SUBSTRINGS (rs:503-524 uses find, no word
        # boundary): "band" is split at the 'and' inside it
        clauses = extract_clauses("the band played on")
        assert any("played" in c for c in clauses)


# ---------------------------------------------------------------------------
# Fuzzy similarity — fuzzy_matcher.rs:826-934 test mod + hand vectors
# ---------------------------------------------------------------------------


class TestFuzzySimilarity:
    def test_similarity_calculations(self):
        # rs:915-925
        m = fuzzy_text_similarity
        assert m("Entity Name", "Entity Name") == pytest.approx(1.0)
        assert m("Entity", "Entity Name") > 0.3
        assert m("xyz", "Entity Name") < 0.3

    def test_jaccard_hand_vector(self):
        # {"tom","sawyer"} vs {"tom","huck"}: 1/3
        assert fuzzy_jaccard("tom sawyer", "tom huck") == pytest.approx(1 / 3)

    def test_containment_hand_vector(self):
        # intersection/min-set-size: {"tom"} ⊂ {"tom","sawyer"} → 1.0
        assert fuzzy_containment("tom", "tom sawyer") == pytest.approx(1.0)
        assert fuzzy_containment("", "") == 1.0
        assert fuzzy_containment("a", "") == 0.0

    def test_levenshtein_sim_hand_vector(self):
        # "kitten"/"sitting": d=3, max_len=7 → 1-3/7
        assert fuzzy_levenshtein_sim("kitten", "sitting") == pytest.approx(
            1 - 3 / 7
        )

    def test_combined_weights(self):
        # "tom" vs "tom": j=1, c=1, lev=1 → 1.0; "abc" vs "xyz": all 0
        assert fuzzy_text_similarity("abc", "xyz") == pytest.approx(0.0)

    def test_word_overlap_list_denominator(self):
        # rs:627-639 quirk: denominator is min LIST length, so repeated
        # words can push overlap over the set-based value
        assert word_overlap(["tom", "tom"], ["tom"]) == pytest.approx(1.0)
        assert word_overlap([], ["a"]) == 0.0

    def test_overall_confidence_weighting(self):
        # rs:642-685: one exact match at 1.0 → confidence 1.0
        assert fuzzy_overall_confidence([(1.0, "ExactEntity")]) == 1.0
        # position decay: later matches weigh 1/(i+1)
        c = fuzzy_overall_confidence(
            [(1.0, "ExactEntity"), (0.0, "ChunkContent")]
        )
        #  (1*1*1 + 0) / (1*1 + 0.5*0.6) = 1/1.3
        assert c == pytest.approx(1 / 1.3)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rograg_graph(spark):
    nodes = spark.createDataFrame(
        [
            ("PERSON_entityname", "Entity Name", "PERSON", 0.9),
            ("PERSON_secondentity", "Second Entity", "PERSON", 0.9),
            ("LOCATION_rivertown", "River Town", "LOCATION", 0.8),
        ],
        "cluster_id string, name string, entity_type string, confidence double",
    )
    edges = spark.createDataFrame(
        [
            (
                "PERSON_entityname",
                "KNOWS",
                "PERSON_secondentity",
                0.85,
            )
        ],
        "subj string, pred string, obj string, confidence double",
    )
    return nodes, edges


def test_classify_intents_operator(spark):
    from graphrag_rs_spark.operators.rograg import classify_intents

    queries = spark.createDataFrame(
        [("What is Entity Name?",), ("Tell me about Entity Name",)],
        "query string",
    )
    rows = {
        r["query"]: r
        for r in classify_intents(queries).collect()
    }
    assert rows["What is Entity Name?"]["primary_intent"] == "Factual"
    assert rows["Tell me about Entity Name"]["primary_intent"] == "Summary"
    # parity with the rule twin
    twin = classify_intent("What is Entity Name?")
    assert rows["What is Entity Name?"]["confidence"] == pytest.approx(
        twin.confidence
    )


def test_decompose_queries_operator(spark):
    from graphrag_rs_spark.operators.rograg import decompose_queries

    # lowercase: the decomposer's patterns are case-sensitive (quirk)
    queries = spark.createDataFrame(
        [("how is tom related to huck?",), ("Simple query",)], "query string"
    )
    rows = decompose_queries(queries).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r["query"], []).append(r)
    assert len(by_query["how is tom related to huck?"]) == 3
    assert len(by_query["Simple query"]) == 1


def test_parse_logic_forms_operator(spark):
    from graphrag_rs_spark.operators.rograg import parse_logic_forms

    queries = spark.createDataFrame(
        [
            ("How is Entity Name related to Second Entity?",),
            ("no parse here",),
        ],
        "query string",
    )
    rows = {r["query"]: r for r in parse_logic_forms(queries).collect()}
    parsed = rows["How is Entity Name related to Second Entity?"]
    assert parsed["predicate"] == "Related"
    assert parsed["arg1"] == "Entity Name"
    assert rows["no parse here"]["predicate"] is None


def test_fuzzy_match_entities_exact_and_partial(spark, rograg_graph):
    # fuzzy_matcher.rs:872-898 exact + partial entity match tests
    from graphrag_rs_spark.operators.rograg import fuzzy_match_entities

    nodes, _ = rograg_graph
    queries = spark.createDataFrame(
        [("Entity Name",), ("Entity",)], "query string"
    )
    rows = fuzzy_match_entities(queries, nodes).collect()
    exact = [
        r for r in rows
        if r["query"] == "Entity Name" and r["match_type"] == "ExactEntity"
    ]
    assert len(exact) == 1
    assert exact[0]["similarity"] == pytest.approx(1.0)
    assert exact[0]["entity_id"] == "PERSON_entityname"

    # JVM similarity ≡ Python twin for a partial match row
    partials = [
        r for r in rows
        if r["query"] == "Entity" and r["match_type"] == "PartialEntity"
    ]
    for r in partials:
        expect = fuzzy_text_similarity("Entity", r["entity_name"]) * 0.9
        assert r["similarity"] == pytest.approx(expect, abs=1e-6)


def test_jvm_fuzzy_similarity_blank_strings_match_twin(spark):
    # empty/whitespace-only strings: split(trim("")) is [""] on the JVM,
    # but "".split() is [] in Python — the array_remove(…, "") in
    # _jvm_fuzzy_similarity keeps the two twins identical (blank-vs-blank
    # must score 0.6 = containment 0.4 + levenshtein 0.2, never 1.0)
    from pyspark.sql import functions as F

    from graphrag_rs_spark.operators.rograg import _jvm_fuzzy_similarity

    pairs = [("", ""), ("   ", ""), ("", "entity name"),
             ("  ", "entity"), ("entity", "entity")]
    df = spark.createDataFrame(pairs, "q string, n string")
    got = {
        (r["q"], r["n"]): r["sim"]
        for r in df.select(
            "q", "n", _jvm_fuzzy_similarity(F.col("q"), F.col("n")).alias("sim")
        ).collect()
    }
    for q, n in pairs:
        assert got[(q, n)] == pytest.approx(
            fuzzy_text_similarity(q, n), abs=1e-9
        ), (q, n)
    assert got[("", "")] == pytest.approx(0.6)


def test_fuzzy_match_threshold_excludes(spark, rograg_graph):
    # rs:927-933: nonsense query → no name matches
    from graphrag_rs_spark.operators.rograg import fuzzy_match_entities

    nodes, _ = rograg_graph
    queries = spark.createDataFrame(
        [("xyzzy plugh nothing",)], "query string"
    )
    rows = fuzzy_match_entities(queries, nodes).collect()
    assert all(r["match_type"] != "PartialEntity" for r in rows)
    assert all(r["match_type"] != "ExactEntity" for r in rows)


def test_execute_logic_forms_is_and_related(spark, rograg_graph):
    from graphrag_rs_spark.operators.rograg import (
        execute_logic_forms,
        parse_logic_forms,
    )

    nodes, edges = rograg_graph
    # NB "What is Entity Name" without '?': the greedy-capture quirk
    # would otherwise leave '?' in the argument and containment-match
    # nothing (exactly what the reference executor would do too)
    queries = spark.createDataFrame(
        [
            ("What is Entity Name",),
            ("How is Entity Name related to Second Entity?",),
            ("Compare Entity Name and River Town",),
        ],
        "query string",
    )
    lf = parse_logic_forms(queries)
    rows = execute_logic_forms(lf, nodes, edges).collect()
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r["predicate"], []).append(r)

    # Is: logic_form.rs:604-631 name-contains match, value "name (type)"
    is_values = [r["value"] for r in by_pred["Is"]]
    assert "Entity Name (PERSON)" in is_values

    # Related: direct KNOWS edge found, value "X KNOWS Y", conf = edge conf
    rel = by_pred["Related"][0]
    assert rel["value"] == "Entity Name KNOWS Second Entity"
    assert rel["confidence"] == pytest.approx(0.85)

    # Compare: rs:693-721 type sentence at 0.7
    cmp_ = by_pred["Compare"][0]
    assert cmp_["value"] == (
        "Entity Name is a PERSON while River Town is a LOCATION"
    )
    assert cmp_["confidence"] == pytest.approx(0.7)


def test_execute_logic_forms_no_direct_edge(spark, rograg_graph):
    from graphrag_rs_spark.operators.rograg import (
        execute_logic_forms,
        parse_logic_forms,
    )

    nodes, edges = rograg_graph
    queries = spark.createDataFrame(
        [("How is Entity Name related to River Town?",)], "query string"
    )
    rows = execute_logic_forms(parse_logic_forms(queries), nodes, edges).collect()
    rel = [r for r in rows if r["predicate"] == "Related"][0]
    assert rel["value"].startswith("No direct relationship found")
    assert rel["confidence"] == pytest.approx(0.3)


# ---------------------------------------------------------------------------
# Validator — validator.rs:295-524
# ---------------------------------------------------------------------------


class TestValidator:
    def test_validate_query_ok(self):
        from graphrag_rs_spark.rules.rograg import validate_query

        r = validate_query("What is the river town?")
        assert r.is_valid
        assert r.validation_score == pytest.approx(1.0)

    def test_validate_query_empty_critical(self):
        from graphrag_rs_spark.rules.rograg import validate_query

        r = validate_query("   ")
        assert not r.is_valid
        assert r.validation_score == 0.0

    def test_validate_query_safety_and_length(self):
        from graphrag_rs_spark.rules.rograg import validate_query

        # safety hit + >1000 chars: two non-critical issues → 1 - 0.2
        long_q = "secret " * 200
        r = validate_query(long_q)
        assert r.is_valid  # High severity does not invalidate (rs:352)
        assert r.validation_score == pytest.approx(0.8)
        kinds = {i.issue_type for i in r.issues}
        assert kinds == {"Length", "Safety"}

    def test_validate_query_no_alpha(self):
        from graphrag_rs_spark.rules.rograg import validate_query

        r = validate_query("12345 !!!")
        assert r.is_valid
        assert any(i.issue_type == "Format" for i in r.issues)

    def test_factual_consistency(self):
        from graphrag_rs_spark.rules.rograg import factual_consistency_score

        # "impossible" contains "possible" — the reference's substring
        # quirk flags the single sentence → score 0
        assert factual_consistency_score("That is impossible") == 0.0
        assert factual_consistency_score("Tom rows the raft") == 1.0

    def test_completeness_score(self):
        from graphrag_rs_spark.rules.rograg import completeness_score

        # 50-char content, 1 source, 1 subquery → (0.5 + 0.5 + 1.0)/3
        assert completeness_score("x" * 50, 1, 1) == pytest.approx(2.0 / 3)
        assert completeness_score("x" * 200, 3, 2) == pytest.approx(1.0)

    def test_readability_score(self):
        from graphrag_rs_spark.rules.rograg import readability_score

        assert readability_score("Tom rows. Huck fishes.") == pytest.approx(1.0)
        run_on = " ".join(["word"] * 40) + "."
        assert readability_score(run_on) == pytest.approx(0.75)

    def test_source_credibility(self):
        from graphrag_rs_spark.rules.rograg import source_credibility_score

        assert source_credibility_score([]) == 0.0
        # 1 source: count 0.2, diversity 1.0 → 0.6
        assert source_credibility_score(["chunk_0001"]) == pytest.approx(0.6)
        # 5 distinct-prefix sources: count 1.0, diversity 1.0 → 1.0
        five = [f"src{i}_aaaaaaaaaa" for i in range(5)]
        assert source_credibility_score(five) == pytest.approx(1.0)


def test_fuzzy_match_chunks_operator(spark):
    from graphrag_rs_spark.operators.rograg import fuzzy_match_chunks
    from graphrag_rs_spark.rules.rograg import word_overlap

    chunks = spark.createDataFrame(
        [
            ("c1", "tom and huck float down the river"),
            ("c2", "completely unrelated content here"),
        ],
        "chunk_id string, text string",
    )
    queries = spark.createDataFrame([("tom huck river",)], "query string")
    rows = fuzzy_match_chunks(queries, chunks).collect()
    ids = {r["chunk_id"] for r in rows}
    assert "c1" in ids and "c2" not in ids
    # keyword-overlap arm parity with the rule twin
    best = max(rows, key=lambda r: r["similarity"])
    expect = word_overlap(
        "tom huck river".split(), "tom and huck float down the river".split()
    )
    assert best["similarity"] == pytest.approx(expect, abs=1e-6)


def test_rograg_process_ladder(spark, rograg_graph):
    from graphrag_rs_spark.operators.rograg import rograg_process

    nodes, edges = rograg_graph
    queries = spark.createDataFrame(
        [
            # refusal: Inappropriate fires at ANY threshold
            ("tell me about violence",),
            # refusal: zero intent scores → Ambiguous (refuses at any
            # threshold — the empty-scores branch, rs:480-490)
            ("zzz qqq xxx",),
            # logic form level: Is-query resolves by containment
            ("What is Entity Name",),
            # fuzzy fallback: no logic pattern parses; name + type words
            # overlap the PERSON node
            ("describe the Entity Name person",),
            # classifies (Summary) but nothing matches anywhere → Fallback
            ("describe zzzqqq wwwfff",),
        ],
        "query string",
    )
    # refusal_threshold 0.0: the reference default (0.8) refuses nearly
    # every query because its pattern scores max out around 0.45 —
    # see the operator docstring; 0.0 lets the retrieval levels run
    rows = rograg_process(
        queries, nodes, edges, refusal_threshold=0.0,
        similarity_threshold=0.5,
    ).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r["query"], []).append(r)

    refusal = by_query["tell me about violence"][0]
    assert refusal["result_type"] == "Refusal"
    assert refusal["confidence"] == 0.0

    zz = by_query["zzz qqq xxx"]
    assert all(r["result_type"] == "Refusal" for r in zz)

    lf = by_query["What is Entity Name"]
    assert any(r["result_type"] == "LogicForm" for r in lf)
    lf_row = [r for r in lf if r["result_type"] == "LogicForm"][0]
    assert lf_row["content"] == "Entity Name (PERSON)"
    assert lf_row["sources"] == ["PERSON_entityname"]

    fz = by_query["describe the Entity Name person"]
    assert any(r["result_type"] == "FuzzyMatch" for r in fz)
    fz_row = [r for r in fz if r["result_type"] == "FuzzyMatch"][0]
    assert "Entity Name" in fz_row["content"]
    assert "PERSON_entityname" in fz_row["sources"]

    fb = by_query["describe zzzqqq wwwfff"]
    assert all(r["result_type"] == "Fallback" for r in fb)
    assert all(r["confidence"] == pytest.approx(0.1) for r in fb)
