"""Concept extraction (lightrag/concept_graph.rs parity) and custom
rule-based NER (nlp/custom_ner.rs parity) — pure rules + Spark operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.concepts import (
    chunk_concepts,
    concept_cooccurrence,
    concept_phrases,
)
from graphrag_rs_spark.operators.ner import extract_with_rules
from graphrag_rs_spark.rules.concepts import (
    extract_concepts,
    extract_keywords,
    is_valid_concept,
)
from graphrag_rs_spark.rules.ner import ExtractionRule, extract

TEXT = (
    "Machine Learning is a field of Artificial Intelligence. "
    "John Smith works at Acme Corporation in New York City. "
    "Neural networks power machine learning. Neural networks scale."
)


class TestConceptRules:
    def test_capitalized_phrases_extracted(self):
        got = extract_concepts(TEXT)
        assert "Artificial Intelligence" in got
        assert "John Smith" in got
        assert "New York City" in got

    def test_stopword_majority_rejected(self):
        # 2 of 3 words are stopwords -> rejected (stop > len/2)
        assert not is_valid_concept("The Only Market")
        # 1 of 2 is not a majority (1 <= 2//2)
        assert is_valid_concept("The Market")

    def test_word_cap_and_min_length(self):
        assert not is_valid_concept("Ab", min_length=3)
        assert not is_valid_concept("One Two Three Four Five Six", max_words=5)

    def test_keywords_freq_floor_and_topk(self):
        kws = extract_keywords("alpha alpha beta beta beta gamma")
        assert "beta" in kws and "alpha" in kws
        assert "gamma" not in kws  # freq 1 < 2

    def test_keyword_edge_trim(self):
        kws = extract_keywords("(quantum) quantum, [quantum]!")
        assert kws == ["quantum"]

    def test_deduped_sorted(self):
        got = extract_concepts(TEXT)
        assert got == sorted(set(got))


class TestConceptOperators:
    @pytest.fixture(scope="class")
    def chunks(self, spark):
        rows = [
            ("c1", "Machine Learning is part of Artificial Intelligence."),
            ("c2", "John Smith studies Machine Learning at Acme Corporation."),
            ("c3", "Acme Corporation ships Artificial Intelligence tools."),
        ]
        return spark.createDataFrame(rows, "chunk_id string, text string")

    def test_concept_phrases_matches_rules(self, chunks):
        got = {
            (r["chunk_id"], r["concept"])
            for r in concept_phrases(chunks).collect()
        }
        # JVM regex path must agree with the Python regex path (phrases only)
        import re

        from graphrag_rs_spark.rules.concepts import (
            CAPITALIZED_PATTERN,
            NOUN_PHRASE_PATTERN,
        )

        want = set()
        for cid, text in chunks.collect():
            for pat in (CAPITALIZED_PATTERN, NOUN_PHRASE_PATTERN):
                for m in pat.finditer(text):
                    if is_valid_concept(m.group(0)):
                        want.add((cid, m.group(0)))
        assert got == want

    def test_chunk_concepts_matches_rules(self, chunks):
        got = {
            (r["chunk_id"], r["concept"]) for r in chunk_concepts(chunks).collect()
        }
        want = {
            (cid, c)
            for cid, text in chunks.collect()
            for c in extract_concepts(text)
        }
        assert got == want

    def test_cooccurrence_counts_and_jaccard(self, chunks):
        cc = concept_cooccurrence(chunk_concepts(chunks))
        row = {
            (r["source"], r["target"]): r
            for r in cc.collect()
        }
        key = ("Acme Corporation", "Machine Learning")
        assert key in row
        r = row[key]
        assert r["count"] == 1  # share only c2
        # Acme in {c2,c3}, ML in {c1,c2}: jaccard = 1/3
        assert abs(r["confidence"] - 1.0 / 3.0) < 1e-9


class TestNERRules:
    def test_rule_type_confidences(self):
        text = "Email bob@acme.com or call Dr. Smith at Acme."
        rules = [
            ExtractionRule("email", "EMAIL", "regex", r"\b[\w.]+@[\w.]+\b"),
            ExtractionRule("acme", "ORG", "exact_match", "acme"),
        ]
        ents = extract(text, rules)
        by_type = {e.entity_type: e for e in ents}
        assert by_type["EMAIL"].confidence == pytest.approx(0.9)
        assert by_type["ORG"].confidence == pytest.approx(1.0)

    def test_overlap_resolution_prefers_higher_confidence(self):
        text = "acme systems"
        rules = [
            ExtractionRule("contains", "A", "contains", "acme"),  # conf 0.6
            ExtractionRule("exact", "B", "exact_match", "acme"),  # conf 1.0
        ]
        ents = extract(text, rules)
        starts = [e for e in ents if e.start == 0]
        assert len(starts) == 1 and starts[0].entity_type == "B"

    def test_prefix_suffix_contains(self):
        text = "prefixed words suffixed"
        assert extract(text, [ExtractionRule("p", "T", "prefix", "pre")])[0].text == "prefixed"
        assert extract(text, [ExtractionRule("s", "T", "suffix", "xed")])[0].text == "prefixed"
        hits = extract(text, [ExtractionRule("c", "T", "contains", "fix")])
        assert {h.text for h in hits} == {"prefixed", "suffixed"}

    def test_dictionary_and_contextual(self):
        text = "visit paris the city of light"
        d = extract(
            text,
            [ExtractionRule("d", "LOC", "dictionary", "", dictionary=("paris",))],
        )
        assert d[0].text == "paris" and d[0].confidence == pytest.approx(0.95)
        c = extract(
            "works at Acme today",
            [ExtractionRule("ctx", "ORG", "contextual", "at|acme|today")],
        )
        assert c and c[0].text == "Acme" and c[0].confidence == pytest.approx(0.85)

    def test_non_overlapping_exact_scan(self):
        ents = extract("ab ab ab", [ExtractionRule("x", "T", "exact_match", "ab")])
        assert [(e.start, e.end) for e in ents] == [(0, 2), (3, 5), (6, 8)]


class TestNEROperator:
    def test_spark_matches_rules(self, spark):
        rows = [
            ("c1", "Dr. Jones met Dr. Smith at Acme Corporation."),
            ("c2", "prefixed contains acme twice: acme."),
            ("c3", ""),
        ]
        chunks = spark.createDataFrame(rows, "chunk_id string, text string")
        rules = [
            ExtractionRule("acme", "ORG", "exact_match", "acme", priority=5),
            ExtractionRule("dr", "PERSON", "regex", r"Dr\. [A-Z][a-z]+", priority=9),
            ExtractionRule("pre", "T", "prefix", "pre", priority=1),
        ]
        got = {
            (r["chunk_id"], r["text"], r["entity_type"], r["start"], r["end"])
            for r in extract_with_rules(chunks, rules).collect()
        }
        want = set()
        for cid, text in rows:
            for e in extract(text, rules):
                want.add((cid, e.text, e.entity_type, e.start, e.end))
        assert got == want and len(got) > 0
