"""Extractive summarizer: reference vectors + Spark-vs-twin parity.

Ports the reference's unit tests (text/extractive_summarizer.rs:366-438)
onto the pure-Python twin, pins hand-derived scoring vectors, then
cross-checks the Arrow-batched Spark operator against the twin over the
synthetic documents table.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rules.extractive import (
    SUMMARY_STOPWORDS,
    _corpus_counts,
    score_sentence,
    split_sentences,
    summarize,
    summarize_sentences,
    truncate_sentence,
)

SF_DIR = "/root/testdata/sf0.001"


class TestRuleTwin:
    def test_sentence_splitting(self):
        # extractive_summarizer.rs:370-380
        text = ("This is the first sentence. This is the second! "
                "Is this the third?")
        sentences = split_sentences(text)
        assert len(sentences) == 3
        assert "first sentence" in sentences[0]
        assert "second" in sentences[1]
        assert "third" in sentences[2]

    def test_short_fragments_dropped(self):
        # the >5-byte filter treats "Dr." style splits as abbreviations
        assert split_sentences("Hi. Ok!") == []
        assert split_sentences("A fine day. Yes.") == ["A fine day."]

    def test_summarization(self):
        # extractive_summarizer.rs:382-396
        text = ("Machine learning is a subset of artificial intelligence. "
                "It focuses on training algorithms to learn from data. "
                "Deep learning is a specialized branch of machine learning. "
                "Neural networks are the foundation of deep learning "
                "systems.")
        summary = summarize(text, 100)
        assert summary
        assert len(summary.encode()) <= 100
        assert ("machine learning" in summary
                or "artificial intelligence" in summary)

    def test_sentence_selection(self):
        # extractive_summarizer.rs:398-410
        text = ("The quick brown fox jumps over the lazy dog. "
                "This is a simple test sentence. "
                "Machine learning and artificial intelligence are "
                "transforming technology.")
        summary = summarize_sentences(text, 1)
        n_end = sum(summary.count(c) for c in ".!?")
        assert n_end <= 2

    def test_truncation(self):
        # extractive_summarizer.rs:412-421
        long_sentence = ("This is a very long sentence that needs to be "
                         "truncated because it exceeds the maximum allowed "
                         "length for the summary")
        truncated = truncate_sentence(long_sentence, 50)
        assert len(truncated.encode()) <= 50
        assert truncated.endswith("...")

    def test_empty_text(self):
        # extractive_summarizer.rs:423-428
        assert summarize("", 100) == ""

    def test_single_sentence(self):
        # extractive_summarizer.rs:430-437
        text = "This is a single sentence."
        assert summarize(text, 100) == text

    def test_position_scores_hand_derived(self):
        # rs:112-121 — first 2.0, last 1.5, middle 1.0 − pos/n·0.5; the
        # position term carries weight 0.3. Sentences built identical in
        # every other factor so only position differs.
        sents = [f"alpha beta gamma delta epsilon zeta{i}." for i in range(4)]
        counts = _corpus_counts(sents)
        s = [score_sentence(sents[i], i, 4, counts) for i in range(4)]
        assert s[0] - s[1] == pytest.approx((2.0 - (1.0 - 0.125)) * 0.3)
        assert s[3] - s[2] == pytest.approx((1.5 - (1.0 - 0.25)) * 0.3)

    def test_numeric_and_proper_noun_terms(self):
        # rs:192-227 — one capitalized non-stop word out of 6 → 1/6·0.1;
        # two numeric words → 0.6·0.1. Compare against a twin sentence
        # with neither, same length bucket and all-unique words.
        base = "alpha beta gamma delta epsilon zeta."
        nn = "alpha beta gamma delta Epsilon 42zeta."
        counts = _corpus_counts([base, nn])
        s_base = score_sentence(base, 1, 3, counts)
        s_nn = score_sentence(nn, 1, 3, counts)
        # proper noun: 1/6; numeric: one word with digits → 0.3
        assert s_nn - s_base == pytest.approx((1 / 6) * 0.1 + 0.3 * 0.1)

    def test_greedy_respects_budget_and_order(self):
        # rs:232-270 — selected sentences re-appear in ORIGINAL order
        text = ("Zebra yankee xray whiskey victor uniform tango sierra. "
                "First sentence wins the position bonus here always. "
                "Numbers 42 and 7 boost this fact sentence clearly.")
        out = summarize(text, 2000)
        sentences = split_sentences(text)
        order = [out.find(s) for s in sentences if s in out]
        assert order == sorted(order)

    def test_stopwords_match_reference_size(self):
        # rs:303-311 lists 79 distinct words
        assert len(SUMMARY_STOPWORDS) == 79


@pytest.mark.usefixtures("spark")
class TestSparkOperator:
    def test_matches_twin_on_documents(self, spark):
        from graphrag_rs_spark.operators.extractive import (
            extractive_summaries,
        )

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(40)
        )
        got = {r["doc_id"]: r for r in
               extractive_summaries(docs, max_length=150).collect()}
        for row in docs.collect():
            key = str(row["doc_id"])  # the operator casts ids to string
            want = summarize(row["text"] or "", 150)
            assert got[key]["summary"] == want, key
            assert got[key]["n_sentences"] == len(
                split_sentences(row["text"] or ""))

    def test_topn_mode_matches_twin(self, spark):
        from graphrag_rs_spark.operators.extractive import (
            extractive_summaries,
        )

        rows = [
            ("d1", "One sentence here. Another follows now. A third "
                   "one closes."),
            ("d2", ""),
            ("d3", None),
            ("d4", "Machine learning with 42 facts. Short stub. The "
                   "final Observation closes strongly."),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {r["doc_id"]: r for r in
               extractive_summaries(
                   df, max_length=None, num_sentences=2).collect()}
        for doc_id, text in rows:
            assert got[doc_id]["summary"] == summarize_sentences(
                text or "", 2), doc_id

    def test_mode_exclusivity(self, spark):
        from graphrag_rs_spark.operators.extractive import (
            extractive_summaries,
        )

        df = spark.createDataFrame([("d", "x.")],
                                   "doc_id string, text string")
        with pytest.raises(ValueError):
            extractive_summaries(df, max_length=100, num_sentences=2)
        with pytest.raises(ValueError):
            extractive_summaries(df, max_length=None, num_sentences=None)
