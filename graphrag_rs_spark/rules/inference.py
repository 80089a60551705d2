"""Implicit relationship-inference scoring rules — exact port of
graphrag-rs inference.rs:155-392 (evidence score, proximity bands,
pattern-context windows, entity-id name extraction).

Pure-Python row rules, executed inside Arrow-batched UDFs by
operators/inference.py and reused verbatim by the test twins. Quirks
preserved on purpose:

- proximity matching is per-whitespace-word ``contains``, so a
  multi-word entity name never matches a single word and scores 0.0
  proximity (inference.rs:320-333);
- ``entities_near_pattern`` windows around the FIRST pattern occurrence
  only (inference.rs:381);
- pattern probes are plain substring hits on the whole lowercased chunk
  ("friend" also fires inside "friendly");
- the family multiplier (×0.8) applies to the accumulated score once,
  after all bonuses/penalties (inference.rs:259-270).

One divergence: the window arithmetic is char-based, not byte-based —
the Rust code slices byte offsets and would panic on a non-UTF-8-boundary
(inference.rs:379-384); chars are the sane Python equivalent.
"""

from __future__ import annotations

# (pattern, weight) — inference.rs:173-204
FRIENDSHIP_PATTERNS: tuple[tuple[str, float], ...] = (
    ("best friend", 0.8),
    ("close friend", 0.7),
    ("good friend", 0.6),
    ("friend", 0.4),
    ("friends", 0.4),
    ("friendship", 0.5),
    ("played together", 0.6),
    ("went together", 0.5),
    ("talked with", 0.4),
    ("helped each other", 0.7),
    ("shared", 0.3),
    ("together", 0.3),
    ("trusted", 0.6),
    ("loyal", 0.5),
    ("bond", 0.5),
    ("close", 0.4),
    ("cared for", 0.6),
    ("looked after", 0.5),
    ("protected", 0.6),
    ("adventure", 0.4),
    ("explore", 0.3),
    ("journey", 0.3),
    ("companion", 0.6),
    ("partner", 0.5),
    ("ally", 0.5),
)

# inference.rs:222-241 (weights already negative)
NEGATIVE_PATTERNS: tuple[tuple[str, float], ...] = (
    ("enemy", -0.8),
    ("enemies", -0.8),
    ("rival", -0.6),
    ("rivals", -0.6),
    ("fought", -0.5),
    ("fight", -0.4),
    ("battle", -0.4),
    ("conflict", -0.5),
    ("angry at", -0.6),
    ("hate", -0.7),
    ("hated", -0.7),
    ("despise", -0.6),
    ("betrayed", -0.8),
    ("betrayal", -0.7),
    ("argued", -0.3),
    ("quarrel", -0.4),
    ("against", -0.2),
    ("opposed", -0.4),
    ("disagree", -0.2),
)

# inference.rs:259
FAMILY_PATTERNS: tuple[str, ...] = (
    "brother", "sister", "cousin", "aunt", "uncle", "family",
)


def extract_entity_name(entity_id: str) -> str:
    """``TYPE_normalized_name`` → ``normalized name`` (inference.rs:286-296)."""
    pos = entity_id.find("_")
    if pos >= 0:
        return entity_id[pos + 1:].replace("_", " ").lower()
    return entity_id.lower()


def calculate_proximity_score(content: str, entity_a: str, entity_b: str) -> float:
    """Banded min-word-distance score (inference.rs:316-352). ``content``
    must already be lowercased; names are lowercase."""
    words = content.split()
    positions_a: list[int] = []
    positions_b: list[int] = []
    for i, word in enumerate(words):
        low = word.lower()
        if entity_a in low:
            positions_a.append(i)
        if entity_b in low:
            positions_b.append(i)
    if not positions_a or not positions_b:
        return 0.0
    min_distance = min(abs(a - b) for a in positions_a for b in positions_b)
    if min_distance <= 2:
        return 0.4
    if min_distance <= 5:
        return 0.3
    if min_distance <= 10:
        return 0.2
    if min_distance <= 20:
        return 0.1
    return 0.05


def entities_near_pattern(
    content: str, entity_a: str, entity_b: str, pattern: str
) -> bool:
    """Both entities within ±100 chars of the FIRST pattern hit
    (inference.rs:370-389)."""
    pos = content.find(pattern)
    if pos < 0:
        return False
    start = max(pos - 100, 0)
    end = min(pos + len(pattern) + 100, len(content))
    context = content[start:end]
    return entity_a in context and entity_b in context


def calculate_evidence_score(chunk_text: str, entity_a_id: str, entity_b_id: str) -> float:
    """Full per-chunk evidence score (inference.rs:155-281): base 0.2 +
    proximity + context-weighted friendship bonuses + context-weighted
    negative penalties, ×0.8 if any family word appears, clamped [0, 1]."""
    content = chunk_text.lower()
    score = 0.2
    name_a = extract_entity_name(entity_a_id)
    name_b = extract_entity_name(entity_b_id)

    score += calculate_proximity_score(content, name_a, name_b)

    for pattern, weight in FRIENDSHIP_PATTERNS:
        if pattern in content:
            factor = 0.5 if entities_near_pattern(content, name_a, name_b, pattern) else 0.3
            score += weight * factor

    for pattern, weight in NEGATIVE_PATTERNS:
        if pattern in content:
            factor = 1.2 if entities_near_pattern(content, name_a, name_b, pattern) else 0.8
            score += weight * factor

    if any(p in content for p in FAMILY_PATTERNS):
        score *= 0.8

    return min(max(score, 0.0), 1.0)
