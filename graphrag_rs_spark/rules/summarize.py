"""Pure-Python port of the reference's extractive summarizer
(graphrag-rs summarization/mod.rs:759-864, sentence splitter
text/mod.rs:339-363).

Deterministic, no-LLM path (LLMConfig.enabled = false): sentences scored
by 0.4·length_score + 0.2·0.5 + 0.4·word_frequency_score; sorted by score
(stable, so ties keep document order exactly like Rust's stable
``sort_by``); greedily packed while ``len(summary) + len(sentence) <=
max_summary_length`` (the reference checks BEFORE appending the joining
space, so the final string may exceed the cap by the number of
separators — ported as-is). Empty pack → first sentence truncated.
"""

from __future__ import annotations

# summarization/mod.rs:855-863 — 50-word stopword list
SUMMARY_STOPWORDS = frozenset(
    """the be to of and a in that have i it for not on with he as you do at
    this but his by from they we say her she or an will my one all would
    there their what so up out if about who get which go me""".split()
)


def extract_sentences(text: str) -> list[str]:
    """text/mod.rs:339-363: split on .!? (enders dropped), trim, skip
    empties, keep the trailing fragment."""
    sentences: list[str] = []
    current = ""
    for ch in text:
        if ch in ".!?":
            t = current.strip()
            if t:
                sentences.append(t)
            current = ""
        else:
            current += ch
    t = current.strip()
    if t:
        sentences.append(t)
    return sentences


def score_sentence(sentence: str, all_words_lower: list[str]) -> float:
    """summarization/mod.rs:816-852. ``all_words_lower`` is the lowercased
    concatenation of every sentence's words (passed in so batch callers
    compute it once)."""
    words = sentence.split()
    n = len(words)
    length_score = 0.1 if n < 5 else 0.3 if n > 30 else 1.0
    position_score = 0.5
    total = len(all_words_lower)
    freq_score = 0.0
    if total:
        from collections import Counter

        counts = Counter(all_words_lower)
        for w in words:
            wl = w.lower()
            if len(wl) > 3 and wl not in SUMMARY_STOPWORDS:
                freq = counts[wl]
                if freq > 1:
                    freq_score += freq / total
    return length_score * 0.4 + position_score * 0.2 + freq_score * 0.4


def extractive_summary(text: str, max_summary_length: int = 200) -> str:
    """summarization/mod.rs:759-813."""
    sentences = extract_sentences(text)
    if not sentences:
        return ""
    if len(sentences) == 1:
        return sentences[0]

    all_words_lower = [w.lower() for s in sentences for w in s.split()]
    scored = sorted(
        enumerate(sentences),
        key=lambda kv: -score_sentence(kv[1], all_words_lower),
    )
    summary = ""
    for _, sentence in scored:
        if len(summary) + len(sentence) <= max_summary_length:
            summary = sentence if not summary else summary + " " + sentence
    if not summary:
        summary = sentences[0][:max_summary_length]
    return summary
