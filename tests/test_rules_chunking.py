"""Ports of graphrag-rs chunking test vectors (text/chunking.rs:254-329)."""

from graphrag_rs_spark.rules.chunking import (
    find_sentence_boundary,
    fixed_chunks,
    hierarchical_chunks,
    is_likely_abbreviation,
)


def test_hierarchical_chunking():  # chunking.rs:258-296
    text = (
        "This is a test document.\n\nIt has multiple paragraphs. Each paragraph "
        "should be preserved as much as possible. This helps maintain semantic "
        "coherence in the chunks."
    )
    chunks = hierarchical_chunks(text, 100, 20)
    assert chunks, "chunks should not be empty"
    texts = [c[2] for c in chunks]
    assert any(
        "multiple paragraphs" in t or "preserved" in t or "coherence" in t for t in texts
    )
    for _, _, chunk in chunks:
        trimmed = chunk.strip()
        if trimmed:
            assert len(trimmed) >= 50
            last = trimmed[-1]
            assert last.isspace() or (not last.isalnum()) or trimmed == text.strip()


def test_hierarchical_offsets_are_real():
    text = "word " * 500
    chunks = hierarchical_chunks(text, 100, 20)
    for start, end, chunk in chunks:
        assert text[start:end] == chunk


def test_sentence_boundary_abbreviation_guard():  # chunking.rs:299-308
    text = "Dr. Smith went to the store. He bought some milk. Then he went home."
    boundary = find_sentence_boundary(text, 0, 30, window=300, abbreviation_guard=True)
    if boundary is not None:
        assert not text[:boundary].endswith("Dr.")


def test_is_likely_abbreviation():
    text = "meet Dr. Smith"
    assert is_likely_abbreviation(text, text.index(".")) is True
    text2 = "the end. Next"
    assert is_likely_abbreviation(text2, text2.index(".")) is False


def test_word_boundary_preservation():  # chunking.rs:311-328
    text = (
        "This is a very long sentence that should be split at word boundaries "
        "rather than in the middle of words."
    )
    chunks = hierarchical_chunks(text, 50, 10)
    for _, _, chunk in chunks:
        trimmed = chunk.strip()
        if trimmed:
            last = trimmed[-1]
            assert last.isspace() or (not last.isalnum()) or chunk.strip() == text.strip()


def test_fixed_chunks_cover_text_and_offsets():
    text = ("Sentence one is here. " * 30).strip()
    chunks = fixed_chunks(text, 120, 30)
    assert chunks
    for start, end, chunk in chunks:
        assert text[start:end] == chunk
    # coverage: every char of text belongs to at least one chunk
    covered = set()
    for start, end, _ in chunks:
        covered.update(range(start, end))
    assert covered == set(range(len(text)))


def test_chunker_min_size_filter():
    # a short paragraph below min_chunk_size=50 is dropped (chunking.rs:79)
    text = "Tiny.\n\n" + ("This paragraph is long enough to survive chunking, truly. " * 3)
    chunks = hierarchical_chunks(text, 100, 10)
    assert all(len(c[2].strip()) >= 50 for c in chunks)
