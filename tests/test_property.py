"""Property-based tests (hypothesis) — the port of the reference's
proptest layer (graphrag-rs tests/property_tests.rs:22-120: storage
idempotency, count consistency), extended to our rules.

Pure-Python rules only — no SparkSession — so these run in milliseconds
and explore far more inputs than the Spark integration tests.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from graphrag_rs_spark.rules.chunking import chunk_document
from graphrag_rs_spark.rules.extraction import (
    extract_entities,
    extract_relationships,
)
from graphrag_rs_spark.rules.similarity import (
    jaccard_similarity,
    jaro_winkler_similarity,
    levenshtein_distance,
    normalize_string,
    pair_similarity,
)

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=400,
)
word_st = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu")), min_size=0,
    max_size=24,
)


class TestChunkingProperties:
    @given(text_st, st.integers(50, 300), st.integers(0, 40))
    @settings(max_examples=200, deadline=None)
    def test_offsets_in_bounds_and_text_matches(self, text, size, overlap):
        for start, end, chunk in chunk_document(
            text, chunk_size=size, overlap=overlap, min_chunk_size=10
        ):
            assert 0 <= start <= end <= len(text)
            assert text[start:end] == chunk

    @given(text_st, st.integers(50, 300))
    @settings(max_examples=100, deadline=None)
    def test_no_empty_chunks(self, text, size):
        for _s, _e, chunk in chunk_document(
            text, chunk_size=size, overlap=20, min_chunk_size=10
        ):
            assert chunk.strip() != ""

    @given(text_st, st.integers(60, 200))
    @settings(max_examples=100, deadline=None)
    def test_monotone_starts(self, text, size):
        starts = [
            s for s, _e, _t in chunk_document(
                text, chunk_size=size, overlap=20, min_chunk_size=10
            )
        ]
        assert starts == sorted(starts)


class TestSimilarityProperties:
    @given(word_st, word_st)
    @settings(max_examples=300, deadline=None)
    def test_levenshtein_symmetry_and_identity(self, a, b):
        assert levenshtein_distance(a, b) == levenshtein_distance(b, a)
        assert levenshtein_distance(a, a) == 0
        # triangle-ish bound: distance never exceeds longer length
        assert levenshtein_distance(a, b) <= max(len(a), len(b))

    @given(word_st, word_st)
    @settings(max_examples=300, deadline=None)
    def test_jaro_winkler_bounds_and_symmetry(self, a, b):
        s = jaro_winkler_similarity(a, b)
        assert 0.0 <= s <= 1.0
        assert abs(s - jaro_winkler_similarity(b, a)) < 1e-12
        if a == b and a:
            assert s == 1.0

    @given(st.lists(word_st, max_size=8), st.lists(word_st, max_size=8))
    @settings(max_examples=200, deadline=None)
    def test_token_jaccard_bounds(self, xs, ys):
        a, b = " ".join(xs), " ".join(ys)
        s = jaccard_similarity(a, b)
        assert 0.0 <= s <= 1.0
        assert abs(s - jaccard_similarity(b, a)) < 1e-12

    @given(word_st)
    @settings(max_examples=200, deadline=None)
    def test_normalize_idempotent(self, w):
        n1 = normalize_string(w)
        assert normalize_string(n1) == n1

    @given(word_st, word_st)
    @settings(max_examples=200, deadline=None)
    def test_pair_similarity_same_type_bounds(self, a, b):
        s = pair_similarity(a, b, "PERSON", "PERSON")
        assert 0.0 <= s <= 1.0
        # cross-type is always zero (string_similarity_linker.rs:134-139)
        assert pair_similarity(a, b, "PERSON", "LOCATION") == 0.0


class TestExtractionProperties:
    @given(text_st)
    @settings(max_examples=150, deadline=None)
    def test_mentions_slice_to_name_case_insensitive(self, text):
        for ent in extract_entities(text, ("PERSON", "ORGANIZATION", "LOCATION"), 0.0):
            for start, end in ent.mentions:
                assert 0 <= start <= end <= len(text)
                assert text[start:end].lower() == ent.name.lower()

    @given(text_st)
    @settings(max_examples=150, deadline=None)
    def test_confidence_bounds_and_dedupe(self, text):
        ents = extract_entities(text, ("PERSON", "ORGANIZATION", "LOCATION"), 0.5)
        keys = [(e.name.lower(), e.entity_type) for e in ents]
        assert len(keys) == len(set(keys)), "within-chunk dedupe violated"
        for e in ents:
            assert 0.5 <= e.confidence <= 1.0

    @given(text_st)
    @settings(max_examples=100, deadline=None)
    def test_relationships_reference_present_entities(self, text):
        ents = extract_entities(text, ("PERSON", "ORGANIZATION", "LOCATION"), 0.5)
        ids = {e.entity_id for e in ents}
        for subj, pred, obj in extract_relationships(ents, text):
            assert subj in ids and obj in ids
            assert subj < obj or subj != obj  # unordered pair emitted once
            assert pred


class TestJson5CleanerProperties:
    """parse_json5 (config_loader.py) must invert json.dumps for any JSON
    value, with or without injected comments and trailing commas."""

    json_st = st.recursive(
        st.none()
        | st.booleans()
        | st.integers(-10**9, 10**9)
        | st.floats(allow_nan=False, allow_infinity=False)
        | st.text(max_size=40),
        lambda children: st.lists(children, max_size=4)
        | st.dictionaries(st.text(max_size=12), children, max_size=4),
        max_leaves=12,
    )

    @given(json_st)
    @settings(max_examples=200, deadline=None)
    def test_round_trip_plain(self, value):
        import json

        from graphrag_rs_spark.config_loader import parse_json5

        if not isinstance(value, dict):
            value = {"v": value}
        assert parse_json5(json.dumps(value)) == value

    @given(json_st, st.integers(0, 3))
    @settings(max_examples=200, deadline=None)
    def test_round_trip_with_comments(self, value, variant):
        import json

        from graphrag_rs_spark.config_loader import parse_json5

        if not isinstance(value, dict):
            value = {"v": value}
        text = json.dumps(value, indent=2)
        if variant == 0:
            text = "// leading comment\n" + text + "\n// trailing\n"
        elif variant == 1:
            text = "/* block */\n" + text
        elif variant == 2:
            # inject a trailing comma before the final brace
            head, _, _ = text.rpartition("}")
            text = head + ", // tail\n}" if head.rstrip().endswith(('"', "]", "}", "e", "l")) or head.rstrip()[-1:].isdigit() else text
        else:
            text = text.replace("\n", " // c\n", 1)
        assert parse_json5(text) == value
