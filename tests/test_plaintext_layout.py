"""Plain-text layout heuristics: ported reference vectors
(text/analysis.rs tests:300-420, text/parsers/plaintext.rs tests:157-170)
plus Spark-side wiring of the plaintext parser into chunk enrichment and
the JVM text_stats operator against its Python twin."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rules.plaintext_layout import (
    calculate_statistics,
    detect_heading_level,
    extract_section_number,
    extract_title,
    find_blank_line_positions,
    is_underline,
    parse_plaintext_structure,
    parse_roman_numeral,
)


class TestAnalysisVectors:
    """Hand-checked against analysis.rs test mod (lines cited per case)."""

    def test_markdown_heading_detection(self):
        # analysis.rs test_markdown_heading_detection
        assert detect_heading_level("# Chapter 1") == 1
        assert detect_heading_level("## Section 1.1") == 2
        assert detect_heading_level("### Subsection 1.1.1") == 3
        assert detect_heading_level("#### Level 4") == 4
        assert detect_heading_level("#No space") is None

    def test_all_caps_detection(self):
        # analysis.rs test_all_caps_detection — level by trimmed length
        assert detect_heading_level("CHAPTER ONE") == 1
        assert detect_heading_level("INTRODUCTION TO MACHINE LEARNING") == 2
        assert detect_heading_level("This is not ALL CAPS") is None

    def test_section_number_extraction(self):
        # analysis.rs test_section_number_extraction
        sec1 = extract_section_number("1. Introduction")
        assert sec1["components"] == [1]
        assert sec1["format"] == "decimal"

        sec2 = extract_section_number("1.2.3 Subsection")
        assert sec2["components"] == [1, 2, 3]

        sec3 = extract_section_number("Chapter 1 Introduction")
        assert sec3["components"] == [1]
        assert sec3["format"] == "mixed"

        sec4 = extract_section_number("I. First Chapter")
        assert sec4["components"] == [1]
        assert sec4["format"] == "roman"

        sec5 = extract_section_number("IV. Fourth Chapter")
        assert sec5["components"] == [4]

    def test_roman_numeral_parsing(self):
        # analysis.rs test_roman_numeral_parsing
        assert parse_roman_numeral("I") == 1
        assert parse_roman_numeral("IV") == 4
        assert parse_roman_numeral("IX") == 9
        assert parse_roman_numeral("XL") == 40
        assert parse_roman_numeral("MCMXCIV") == 1994
        assert parse_roman_numeral("ABC") is None

    def test_numbered_heading_level_is_depth(self):
        # analysis.rs:54-59 — a numbered heading's level = component depth
        assert detect_heading_level("1. Introduction") == 1
        assert detect_heading_level("1.2.3 Subsection") == 3

    def test_underline_levels(self):
        # analysis.rs is_underline — ===/---/___ at >= 3 chars
        assert is_underline("===") == 1
        assert is_underline("-----------") == 2
        assert is_underline("___") == 3
        assert is_underline("==") is None
        assert is_underline("=-=") is None

    def test_blank_line_positions(self):
        # first line of each blank RUN, by char offset (+1 per newline)
        text = "a\n\n\nb\n\nc"
        assert find_blank_line_positions(text) == [2, 6]

    def test_statistics(self):
        s = calculate_statistics("One two. Three!\n\nFour five?")
        assert s["word_count"] == 5
        assert s["sentence_count"] == 3
        assert s["paragraph_count"] == 2
        assert s["char_count"] == len("One two. Three!\n\nFour five?")
        assert s["avg_sentence_length"] == pytest.approx(5 / 3)
        assert s["avg_word_length"] == pytest.approx(s["char_count"] / 5)

    def test_statistics_empty_floor(self):
        # both counts clamp to >= 1 even on empty text (analysis.rs .max(1))
        s = calculate_statistics("")
        assert s["word_count"] == 0
        assert s["sentence_count"] == 1
        assert s["paragraph_count"] == 1
        assert s["avg_word_length"] == 0.0

    def test_extract_title(self):
        assert extract_title("MOBY DICK\n\nCall me Ishmael.") == "MOBY DICK"
        assert extract_title("# The Title\nbody") == "The Title"
        assert extract_title("\n\nA plain first line here") == (
            "A plain first line here"
        )


class TestPlaintextParser:
    def test_underline_detection(self):
        # plaintext.rs test_underline_detection
        content = (
            "Chapter One\n===========\n\nSome text\n\n"
            "Section 1.1\n-----------\n\nMore text"
        )
        sections = parse_plaintext_structure(content)
        assert len(sections) >= 2
        assert sections[0].heading.level == 1
        assert sections[0].heading.text == "Chapter One"
        assert sections[1].heading.level == 2
        assert sections[1].heading.text == "Section 1.1"
        # hierarchy: level-2 section nests under the level-1 chapter
        assert sections[1].parent == 0
        assert sections[0].children == [1]

    def test_all_caps_heading_detected_inline(self):
        content = "INTRODUCTION\n\nBody text follows here.\n"
        sections = parse_plaintext_structure(content)
        assert len(sections) == 1
        assert sections[0].heading.level == 1
        assert sections[0].heading.text == "INTRODUCTION"
        # reference quirk (plaintext.rs:128-130): an inline-detected
        # heading does NOT advance the offset, so its start stays 0
        assert sections[0].heading.start == 0
        assert sections[0].content_end == len(content)

    def test_underlined_heading_offset_quirk(self):
        # reference quirk (plaintext.rs:103-109): the offset advances past
        # the heading line + TRIMMED underline before the Heading is built
        content = "Title\n=====\nbody"
        sections = parse_plaintext_structure(content)
        assert len(sections) == 1
        # len("Title\n") + len("=====\n") = 12
        assert sections[0].heading.start == 12
        assert sections[0].heading.end == 12 + len("Title")

    def test_no_headings_no_sections(self):
        sections = parse_plaintext_structure(
            "just some prose\nwith two lines but no structure at all"
        )
        assert sections == []


@pytest.mark.usefixtures("spark")
class TestSparkWiring:
    def test_enrich_chunks_plaintext_layout(self, spark):
        full = (
            "CHAPTER ONE\n\nIt was the best of times. "
            "Call me Ishmael today.\n\n"
            "Section 2\n---------\n\nAnother block of body text here."
        )
        docs = spark.createDataFrame(
            [("d1", full)], "doc_id string, full_text string"
        )
        # chunk starts: one inside chapter one, one inside section 2
        chunks = spark.createDataFrame(
            [
                ("c1", "d1", "It was the best of times.", 13),
                ("c2", "d1", "Another block of body text here.", 80),
            ],
            "chunk_id string, doc_id string, text string, start int",
        )
        from graphrag_rs_spark.operators.enrichment import enrich_chunks

        rows = {
            r["chunk_id"]: r
            for r in enrich_chunks(
                chunks, docs, layout="plaintext"
            ).collect()
        }
        assert rows["c1"]["chapter"] == "CHAPTER ONE"
        assert rows["c1"]["structural_level"] == 1
        # c2 falls in the underlined level-2 section nested under ch.1
        assert rows["c2"]["heading_path"] == ["CHAPTER ONE", "Section 2"]
        assert rows["c2"]["structural_level"] == 2

    def test_enrich_chunks_rejects_unknown_layout(self, spark):
        docs = spark.createDataFrame(
            [("d", "x")], "doc_id string, full_text string"
        )
        chunks = spark.createDataFrame(
            [("c", "d", "x", 0)],
            "chunk_id string, doc_id string, text string, start int",
        )
        from graphrag_rs_spark.operators.enrichment import enrich_chunks

        with pytest.raises(ValueError, match="unknown layout"):
            enrich_chunks(chunks, docs, layout="pdf")

    def test_text_stats_matches_python_twin(self, spark):
        texts = [
            "One two. Three!\n\nFour five?",
            "",
            "   ",
            "No terminal punctuation at all",
            "a.b.c",
            "Para one.\n\n\n\nPara two! And more words here?",
            "unicode café naïve — ok.",
        ]
        df = spark.createDataFrame(
            [(str(i), t) for i, t in enumerate(texts)],
            "doc_id string, text string",
        )
        from graphrag_rs_spark.operators.text_analysis import text_stats

        got = {r["doc_id"]: r.asDict() for r in text_stats(df).collect()}
        for i, t in enumerate(texts):
            want = calculate_statistics(t)
            have = got[str(i)]
            for k in ("word_count", "sentence_count", "paragraph_count",
                      "char_count"):
                assert have[k] == want[k], (i, k, have[k], want[k])
            assert have["avg_sentence_length"] == pytest.approx(
                want["avg_sentence_length"]
            )
            assert have["avg_word_length"] == pytest.approx(
                want["avg_word_length"]
            )
