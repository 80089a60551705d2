"""Enriched metadata-aware retrieval rule twins (retrieval/enriched.rs).

Pure-Python mirrors of the boost/filter arithmetic, used as the test
oracle for the Spark operator (operators/enriched_retrieval.py).

Defaults (enriched.rs:28-37): keyword weight 0.3, structure weight 0.2,
summary weight 0.15, min keyword matches 1, structure filtering on.

Quirk reproduced on purpose: ``extract_structure_references`` receives
the LOWERCASED query, so the reference's "direct mention" branch (words
starting with an uppercase char, enriched.rs:330-334) can never fire —
only the chapter/section/part regexes contribute references.
"""

from __future__ import annotations

import re

KEYWORD_MATCH_WEIGHT = 0.3
STRUCTURE_MATCH_WEIGHT = 0.2
SUMMARY_WEIGHT = 0.15
MIN_KEYWORD_MATCHES = 1
COMPLETENESS_BONUS = 0.05
BOOST_GATE = 0.05

_STRUCTURE_PATTERNS = (
    # enriched.rs:316-320 — full match (capture 0) of the FIRST hit each
    re.compile(r"chapter\s+(\d+|[ivxlcdm]+|\w+)"),
    re.compile(r"section\s+(\d+\.?\d*)"),
    re.compile(r"part\s+(\d+|[ivxlcdm]+)"),
)


def query_words(query: str) -> set[str]:
    """enriched.rs:75-80 — lowercased words longer than 3 bytes."""
    return {w for w in query.lower().split() if len(w.encode()) > 3}


def extract_structure_references(query_lower: str) -> list[str]:
    """enriched.rs:311-337."""
    refs = []
    for pat in _STRUCTURE_PATTERNS:
        m = pat.search(query_lower)
        if m:
            refs.append(m.group(0))
    for word in query_lower.split():
        if word[:1].isupper() and len(word.encode()) > 5:  # dead branch
            refs.append(word)
    return refs


def count_keyword_matches(chunk_keywords: list[str],
                          qwords: set[str]) -> int:
    """enriched.rs:368-374 — counts chunk keywords (duplicates too)."""
    return sum(1 for k in chunk_keywords if k.lower() in qwords)


def matches_query(text: str, qwords: set[str]) -> bool:
    """enriched.rs:381-388 — at least max(|qwords|/2, 1) words appear."""
    tl = text.lower()
    hits = sum(1 for w in qwords if w in tl)
    return hits >= max(len(qwords) // 2, 1)


def structure_boost(chapter: str | None, section: str | None,
                    subsection: str | None,
                    refs: list[str]) -> float | None:
    """enriched.rs:340-378 — 0.5/0.3/0.2 per matching reference."""
    if not refs:
        return None
    boost = 0.0
    for ref in refs:
        rl = ref.lower()
        if chapter and rl in chapter.lower():
            boost += 0.5
        if section and rl in section.lower():
            boost += 0.3
        if subsection and rl in subsection.lower():
            boost += 0.2
    return boost if boost > 0.0 else None


def metadata_boost(
    query: str,
    chunk_keywords: list[str],
    chapter: str | None,
    section: str | None,
    subsection: str | None,
    summary: str | None,
    completeness: float,
    enable_structure_filtering: bool = True,
) -> float:
    """The boost sum of enriched.rs:90-117 (before the 0.05 gate)."""
    qwords = query_words(query)
    refs = extract_structure_references(query.lower())
    boost = 0.0
    matches = count_keyword_matches(chunk_keywords, qwords)
    if matches >= MIN_KEYWORD_MATCHES:
        boost += (matches / max(len(qwords), 1)) * KEYWORD_MATCH_WEIGHT
    if enable_structure_filtering:
        sb = structure_boost(chapter, section, subsection, refs)
        if sb is not None:
            boost += sb * STRUCTURE_MATCH_WEIGHT
    if summary is not None and matches_query(summary, qwords):
        boost += SUMMARY_WEIGHT
    if completeness > 0.7:
        boost += COMPLETENESS_BONUS
    return boost


def matches_structure(chapter: str | None, section: str | None,
                      subsection: str | None, refs: list[str]) -> bool:
    """enriched.rs:391-419."""
    for ref in refs:
        rl = ref.lower()
        if chapter and rl in chapter.lower():
            return True
        if section and rl in section.lower():
            return True
        if subsection and rl in subsection.lower():
            return True
    return False
