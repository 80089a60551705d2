"""Extractive-summarization rule twin.

Pure-Python re-implementation of the reference's sentence-ranking
extractive summarizer (text/extractive_summarizer.rs:9-357), used as the
single-process oracle for tests and inside the Arrow-batched Spark
operator (operators/extractive.py) — each document is summarized
independently, so the distributed shape is a shuffle-free narrow map and
the twin IS the kernel.

Faithfulness notes:

* Rust ``str::len()`` is BYTE length; every length the reference takes
  on a string (the >5 sentence filter, the max_length budget, the
  truncation window, the >2 proper-noun gate) is computed here on the
  UTF-8 encoding, not the code-point count.
* Rust ``sort_by`` is stable; Python ``sorted`` is stable too, so score
  ties keep first-seen sentence order in both.
* Scores are f64 here vs the reference's f32; test vectors keep margins
  so widened precision cannot flip a selection.
* ``char::is_alphanumeric`` (Unicode alphabetic-or-numeric) is twinned
  with ``str.isalnum()``.
"""

from __future__ import annotations

SUMMARY_STOPWORDS = frozenset({
    # extractive_summarizer.rs:302-314 (load_stopwords)
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "i", "it",
    "for", "not", "on", "with", "he", "as", "you", "do", "at", "this",
    "but", "his", "by", "from", "they", "we", "say", "her", "she", "or",
    "an", "will", "my", "one", "all", "would", "there", "their", "what",
    "so", "up", "out", "if", "about", "who", "get", "which", "go", "me",
    "when", "make", "can", "like", "time", "no", "just", "him", "know",
    "take", "people", "into", "year", "your", "good", "some", "could",
    "them", "see", "other", "than", "then", "now", "look", "only",
    "come", "its", "over", "think",
})

_ENDINGS = {".", "!", "?"}


def _blen(s: str) -> int:
    """Rust ``str::len`` twin: UTF-8 byte length."""
    return len(s.encode("utf-8"))


def split_sentences(text: str) -> list[str]:
    """extractive_summarizer.rs:71-98 — split at ./!/? , keep trimmed
    pieces longer than 5 BYTES (short pieces are likely abbreviations)."""
    sentences: list[str] = []
    current: list[str] = []
    for ch in text:
        current.append(ch)
        if ch in _ENDINGS:
            trimmed = "".join(current).strip()
            if trimmed and _blen(trimmed) > 5:
                sentences.append(trimmed)
            current = []
    trimmed = "".join(current).strip()
    if trimmed and _blen(trimmed) > 5:
        sentences.append(trimmed)
    return sentences


def _norm_word(w: str) -> str:
    """``to_lowercase().trim_matches(|c| !c.is_alphanumeric())`` twin."""
    w = w.lower()
    start, end = 0, len(w)
    while start < end and not w[start].isalnum():
        start += 1
    while end > start and not w[end - 1].isalnum():
        end -= 1
    return w[start:end]


def _word_frequency_score(sentence: str, word_counts: dict[str, int]) -> float:
    """extractive_summarizer.rs:154-189. ``word_counts`` is the corpus
    (all-sentence) token-frequency map over normalized non-stopwords."""
    sent_words = [
        nw for nw in (_norm_word(w) for w in sentence.split())
        if nw and nw not in SUMMARY_STOPWORDS
    ]
    if not sent_words:
        return 0.0
    total = sum(word_counts.get(w, 0) for w in sent_words)
    avg = total / len(sent_words)
    return min(avg / 3.0, 1.0)


def _proper_noun_score(sentence: str) -> float:
    """extractive_summarizer.rs:192-210 — capitalized, >2 bytes, not a
    stopword (sentence-start words included, as in the reference)."""
    words = sentence.split()
    if not words:
        return 0.0
    count = sum(
        1 for w in words
        if w[0].isupper() and _blen(w) > 2
        and w.lower() not in SUMMARY_STOPWORDS
    )
    return min(count / len(words), 1.0)


def _numeric_score(sentence: str) -> float:
    """extractive_summarizer.rs:213-227."""
    if not any(c.isnumeric() for c in sentence):
        return 0.0
    number_count = sum(
        1 for w in sentence.split() if any(c.isnumeric() for c in w)
    )
    return min(number_count * 0.3, 1.0)


def score_sentence(sentence: str, position: int, n_sentences: int,
                   word_counts: dict[str, int]) -> float:
    """extractive_summarizer.rs:108-151 — weighted position / length /
    frequency / proper-noun / numeric score."""
    if position == 0:
        position_score = 2.0
    elif position == n_sentences - 1:
        position_score = 1.5
    else:
        position_score = 1.0 - (position / n_sentences) * 0.5
    total = position_score * 0.3

    word_count = len(sentence.split())
    if word_count < 5:
        length_score = 0.3
    elif word_count > 40:
        length_score = 0.5
    elif 10 <= word_count <= 25:
        length_score = 1.0
    else:
        length_score = 0.7
    total += length_score * 0.2

    total += _word_frequency_score(sentence, word_counts) * 0.3
    total += _proper_noun_score(sentence) * 0.1
    total += _numeric_score(sentence) * 0.1
    return total


def _corpus_counts(sentences: list[str]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for s in sentences:
        for w in s.split():
            nw = _norm_word(w)
            if nw and nw not in SUMMARY_STOPWORDS:
                counts[nw] = counts.get(nw, 0) + 1
    return counts


def _score_all(sentences: list[str]) -> list[tuple[int, float]]:
    counts = _corpus_counts(sentences)
    return [
        (i, score_sentence(s, i, len(sentences), counts))
        for i, s in enumerate(sentences)
    ]


def truncate_sentence(sentence: str, max_length: int) -> str:
    """extractive_summarizer.rs:273-299 — byte-level truncation to a word
    boundary with a ``...`` suffix (operates on the UTF-8 encoding the
    way the reference's is_char_boundary walk does)."""
    raw = sentence.encode("utf-8")
    if len(raw) <= max_length:
        return sentence
    end = max(max_length - 3, 0)
    while end > 0 and (raw[end] & 0xC0) == 0x80:  # not a char boundary
        end -= 1
    # walk back to whitespace (chars().nth(end) indexes CHARS in the
    # reference; on ASCII — all test vectors — byte == char index)
    while end > 0 and not chr(raw[end]).isspace():
        end -= 1
    if end == 0:
        end = max(max_length - 3, 0)
        while end > 0 and (raw[end] & 0xC0) == 0x80:
            end -= 1
    return raw[:end].decode("utf-8", errors="ignore").strip() + "..."


def select_sentences(scored: list[tuple[int, float]],
                     sentences: list[str], max_length: int) -> list[int]:
    """extractive_summarizer.rs:232-270 — greedy best-first fill with a
    90% early exit; falls back to the single best sentence untruncated."""
    ranked = sorted(scored, key=lambda p: -p[1])  # stable, like sort_by
    selected: list[int] = []
    current = 0
    for idx, _score in ranked:
        slen = _blen(sentences[idx])
        if current + slen + 1 <= max_length:
            selected.append(idx)
            current += slen + 1
        if current >= max_length * 90 // 100:
            break
    selected.sort()
    if not selected and ranked:
        selected.append(ranked[0][0])
    return selected


def summarize(text: str, max_length: int) -> str:
    """extractive_summarizer.rs:30-68 (character-budget mode)."""
    sentences = split_sentences(text)
    if not sentences:
        return ""
    if len(sentences) == 1:
        s = sentences[0]
        return s if _blen(s) <= max_length else truncate_sentence(
            s, max_length)
    scored = _score_all(sentences)
    chosen = select_sentences(scored, sentences, max_length)
    return " ".join(sentences[i] for i in chosen)


def summarize_sentences(text: str, num_sentences: int) -> str:
    """extractive_summarizer.rs:317-357 (top-N-sentences mode)."""
    sentences = split_sentences(text)
    if not sentences:
        return ""
    if len(sentences) <= num_sentences:
        return " ".join(sentences)
    ranked = sorted(_score_all(sentences), key=lambda p: -p[1])
    chosen = sorted(i for i, _ in ranked[:num_sentences])
    return " ".join(sentences[i] for i in chosen)
