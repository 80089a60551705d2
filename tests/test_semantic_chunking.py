"""Hash embeddings (vector/mod.rs:559-685 semantics) and the semantic
chunker (text/semantic_chunking.rs) — rules + Spark operator."""

from __future__ import annotations

import numpy as np
import pytest

from graphrag_rs_spark.functions.embeddings import (
    embed_series,
    embed_text,
    word_vector,
)
from graphrag_rs_spark.rules.semantic_chunking import (
    SemanticChunkerConfig,
    create_chunks,
    determine_breakpoints,
    semantic_chunk,
    similarity_differences,
    split_sentences,
)


class TestHashEmbeddings:
    def test_deterministic_and_unit_norm(self):
        a = embed_text("hello world", 64)
        b = embed_text("hello world", 64)
        assert np.allclose(a, b)
        assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-9)

    def test_case_insensitive_words(self):
        assert np.allclose(embed_text("Hello", 32), embed_text("hello", 32))

    def test_word_order_invariant_average(self):
        assert np.allclose(
            embed_text("alpha beta", 64), embed_text("beta alpha", 64)
        )

    def test_distinct_words_differ(self):
        assert not np.allclose(word_vector("alpha", 64), word_vector("beta", 64))

    def test_empty_text_zero_vector(self):
        assert np.allclose(embed_text("", 16), np.zeros(16))

    def test_similar_bags_high_cosine(self):
        a = embed_text("the quick brown fox", 64)
        b = embed_text("the quick brown dog", 64)
        c = embed_text("completely unrelated words here", 64)
        assert float(a @ b) > float(a @ c)

    def test_batch_matches_single(self):
        batch = embed_series(["one two", "three"], 32)
        assert np.allclose(batch[0], embed_text("one two", 32))
        assert np.allclose(batch[1], embed_text("three", 32))


class TestSentenceSplit:
    def test_basic_enders(self):
        s = split_sentences("One. Two! Three? Four")
        assert s == ["One.", "Two!", "Three?", "Four"]

    def test_blank_line_flush(self):
        s = split_sentences("no ender yet\n\nnext para.")
        assert s == ["no ender yet", "next para."]

    def test_multiline_sentence(self):
        s = split_sentences("spans\ntwo lines.")
        assert s == ["spans two lines."]


class TestBreakpoints:
    def test_absolute_strategy(self):
        cfg = SemanticChunkerConfig(strategy="absolute", threshold_amount=0.5)
        assert determine_breakpoints([0.1, 0.9, 0.2], cfg) == [2]

    def test_percentile_strategy(self):
        cfg = SemanticChunkerConfig(strategy="percentile", threshold_amount=50.0)
        diffs = [0.1, 0.2, 0.3, 0.4]
        # sorted idx = floor(4*0.5)=2 -> thr 0.3; strictly greater -> [4]
        assert determine_breakpoints(diffs, cfg) == [4]

    def test_std_dev_strategy(self):
        cfg = SemanticChunkerConfig(strategy="std_dev", threshold_amount=1.0)
        diffs = [0.0, 0.0, 1.0]
        # mean=1/3, pop σ=sqrt(2)/3 -> thr≈0.805 -> breakpoint after idx 2
        assert determine_breakpoints(diffs, cfg) == [3]

    def test_similarity_differences_buffer(self):
        e = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
        d = similarity_differences(e, 1)
        assert d[0] == pytest.approx(0.0)
        assert d[1] == pytest.approx(1.0)

    # --- the reference's own unit vectors, ported verbatim ---

    def test_rs_percentile_threshold_vector(self):
        """semantic_chunking.rs:362-379 test_percentile_threshold: the
        95th percentile of [0.1 … 1.0] indexes sorted[min(int(10·0.95),
        9)] = sorted[9] = 1.0 (the reference asserts ≥ 0.9)."""
        from graphrag_rs_spark.rules.semantic_chunking import (
            breakpoint_threshold,
        )

        cfg = SemanticChunkerConfig(
            strategy="percentile", threshold_amount=95.0
        )
        diffs = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]
        thr = breakpoint_threshold(diffs, cfg)
        assert thr == pytest.approx(1.0)
        assert thr >= 0.9  # the reference's literal assertion

    def test_rs_std_threshold_zero_sigma_vector(self):
        """semantic_chunking.rs:381-396 test_std_threshold: identical
        diffs → σ = 0 → threshold collapses to the mean regardless of the
        3σ multiplier."""
        from graphrag_rs_spark.rules.semantic_chunking import (
            breakpoint_threshold,
        )

        cfg = SemanticChunkerConfig(strategy="std_dev", threshold_amount=3.0)
        thr = breakpoint_threshold([0.5, 0.5, 0.5, 0.5, 0.5], cfg)
        assert thr == pytest.approx(0.5, abs=1e-3)

    def test_rs_sentence_splitting_vector(self):
        """semantic_chunking.rs:322-336 test_sentence_splitting."""
        s = split_sentences(
            "This is sentence one. This is sentence two! "
            "Is this sentence three?"
        )
        assert len(s) == 3
        assert "sentence one" in s[0]
        assert "sentence two" in s[1]
        assert "sentence three" in s[2]

    def test_rs_semantic_chunking_basic_vector(self):
        """semantic_chunking.rs:398-425 test_semantic_chunking_basic:
        percentile 50, min 1, max 0, buffer 1 over the 4-sentence text
        yields non-empty chunks, each with content and a positive
        sentence count."""
        from graphrag_rs_spark.rules.semantic_chunking import semantic_chunk

        cfg = SemanticChunkerConfig(
            strategy="percentile", threshold_amount=50.0,
            min_chunk_size=1, max_chunk_size=0, buffer_size=1,
        )
        chunks = semantic_chunk(
            "Alice loves programming. Bob also codes daily. "
            "The weather is sunny. Rain is expected tomorrow.",
            cfg,
        )
        assert chunks
        for c in chunks:
            assert c["content"]
            assert c["sentence_count"] > 0


class TestCreateChunks:
    CFG = SemanticChunkerConfig(min_chunk_size=2, max_chunk_size=0)

    def test_short_run_merges_forward(self):
        # breakpoint after 1 sentence: run of 1 < min 2 merges into next
        chunks = create_chunks(["a.", "b.", "c."], [1], self.CFG)
        assert len(chunks) == 1
        assert chunks[0]["sentence_count"] == 3

    def test_max_size_resplit(self):
        cfg = SemanticChunkerConfig(min_chunk_size=1, max_chunk_size=2)
        chunks = create_chunks(["a.", "b.", "c.", "d.", "e."], [], cfg)
        assert [c["sentence_count"] for c in chunks] == [2, 2, 1]

    def test_single_sentence_fast_path(self):
        out = semantic_chunk("only one sentence")
        assert len(out) == 1 and out[0]["sentence_count"] == 1


class TestSemanticChunkOperator:
    def test_spark_matches_rules(self, spark):
        text = (
            "Dogs bark loudly. Dogs bark at night. Dogs bark often. "
            "Quantum physics is strange. Quantum fields interact. "
            "Dogs bark again."
        )
        docs = spark.createDataFrame(
            [("c0", "c0", text), ("c1", "c1", "")],
            "conv_id string, doc_id string, full_text string",
        )
        from graphrag_rs_spark.operators.chunking import semantic_chunk_documents

        cfg = SemanticChunkerConfig(strategy="absolute", threshold_amount=0.6)
        got = [
            (r["doc_id"], r["chunk_idx"], r["text"], r["start_sentence"],
             r["end_sentence"])
            for r in semantic_chunk_documents(docs, cfg)
            .orderBy("doc_id", "chunk_idx")
            .collect()
        ]
        want = [
            ("c0", i, ch["content"], ch["start_sentence"], ch["end_sentence"])
            for i, ch in enumerate(semantic_chunk(text, cfg))
        ]
        assert got == want and len(got) >= 2
