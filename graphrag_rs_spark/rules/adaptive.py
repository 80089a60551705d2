"""Adaptive-retrieval rule twins (query analysis, strategy weights,
fusion, diversity selection).

Pure-Python re-implementations of the reference's adaptive retrieval
logic, used as the single-process oracle for tests and inside the
Arrow-batched per-query selection UDF:

* ``analyze_query`` — retrieval/mod.rs:600-684 (RetrievalSystem::
  analyze_query): graph-entity detection by bidirectional substring
  containment, concept extraction, five-way query type, six-way intent,
  complexity score.
* ``calculate_strategy_weights`` — retrieval/mod.rs:895-905
  ((vector, graph, hierarchical) by type × intent).
* ``select_strategy_weights`` — retrieval/adaptive.rs:55-87,195-209
  (AdaptiveConfig per-type 4-weight tables gated on
  min_confidence_for_specialization = 0.6).
* ``cross_strategy_fusion`` — retrieval/adaptive.rs:220-253 (dedupe by
  id keeping the HIGHER score, sort desc).
* ``diversity_aware_selection`` — retrieval/adaptive.rs:256-298 (the
  order-sensitive entity-diversity loop plus the backfill pass).

Scores are f64 (reference: f32); pinned vectors keep margins from every
threshold.
"""

from __future__ import annotations

from dataclasses import dataclass

# retrieval/mod.rs:1411-1418 — NOTE: shorter than the summarizer's list
ADAPTIVE_STOP_WORDS = frozenset({
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "i",
    "it", "for", "not", "on", "with", "he", "as", "you", "do", "at",
    "this", "but", "his", "by", "from", "they", "we", "say", "her",
    "she", "or", "an", "will", "my", "one", "all", "would", "there",
    "their", "what", "so", "up", "out", "if", "about", "who", "get",
    "which", "go", "me",
})

ABSTRACT_INDICATORS = (
    # retrieval/mod.rs:1291-1304
    "concept", "idea", "theory", "principle", "philosophy", "meaning",
    "understanding", "knowledge", "wisdom", "truth", "beauty", "justice",
)

QUESTION_WORDS = (
    # retrieval/mod.rs:1312-1314
    "what", "how", "why", "when", "where", "who", "which", "explain",
    "describe",
)

OVERVIEW_WORDS = ("overview", "summary", "general", "about")
DETAILED_WORDS = ("detailed", "specific", "exactly", "precise")
COMPARATIVE_WORDS = ("compare", "vs", "versus", "between", "difference")
CAUSAL_WORDS = ("cause", "why", "because", "lead", "result")
TEMPORAL_WORDS = ("when", "time", "before", "after", "during")


def analyze_query(query: str, entity_names: list[str]) -> dict:
    """retrieval/mod.rs:600-684. ``entity_names`` stands in for
    ``graph.entities()`` — detection matches when any query word is a
    substring of the lowercased name or vice versa. ``key_entities``
    preserves the input order of ``entity_names`` (the reference walks
    the graph's entity list in order)."""
    query_lower = query.lower()
    words = query_lower.split()

    key_entities = []
    for name in entity_names:
        nl = name.lower()
        if any(nl.find(w) >= 0 or w.find(nl) >= 0 for w in words):
            key_entities.append(name)

    key_lower = [e.lower() for e in key_entities]
    concepts = [
        w for w in words
        if len(w) > 3 and w not in ADAPTIVE_STOP_WORDS
        and not any(el.find(w) >= 0 or w.find(el) >= 0 for el in key_lower)
    ]

    if len(key_entities) > 1:
        query_type = "relationship"
    elif key_entities:
        query_type = "entity_focused"
    elif any(w in ABSTRACT_INDICATORS for w in words):
        query_type = "conceptual"
    elif any(w in QUESTION_WORDS for w in words):
        query_type = "exploratory"
    else:
        query_type = "factual"

    if any(w in OVERVIEW_WORDS for w in words):
        intent = "overview"
    elif any(w in DETAILED_WORDS for w in words):
        intent = "detailed"
    elif any(w in COMPARATIVE_WORDS for w in words):
        intent = "comparative"
    elif any(w in CAUSAL_WORDS for w in words):
        intent = "causal"
    elif any(w in TEMPORAL_WORDS for w in words):
        intent = "temporal"
    else:
        intent = "detailed"

    complexity = min(
        len(words) * 0.1 + len(key_entities) * 0.3 + len(concepts) * 0.2,
        1.0,
    )
    return {
        "query_type": query_type,
        "key_entities": key_entities,
        "concepts": concepts,
        "intent": intent,
        "complexity_score": complexity,
    }


def calculate_strategy_weights(query_type: str, intent: str
                               ) -> tuple[float, float, float]:
    """retrieval/mod.rs:895-905 — (vector, graph, hierarchical)."""
    if query_type == "entity_focused":
        return (0.5, 0.4, 0.1)
    if query_type == "relationship":
        return (0.3, 0.6, 0.1)
    if query_type == "conceptual":
        return (0.2, 0.2, 0.6) if intent == "overview" else (0.4, 0.3, 0.3)
    if query_type == "exploratory":
        return (0.3, 0.2, 0.5) if intent == "overview" else (0.4, 0.4, 0.2)
    return (0.6, 0.3, 0.1)  # factual


# --- adaptive.rs weight tables --------------------------------------------

#: (vector, graph, hierarchical, bm25) — retrieval/adaptive.rs:55-87
ADAPTIVE_WEIGHT_TABLES: dict[str, tuple[float, float, float, float]] = {
    "entity_focused": (0.2, 0.5, 0.2, 0.1),
    "conceptual": (0.6, 0.1, 0.3, 0.0),
    "factual": (0.2, 0.1, 0.1, 0.6),
    "relationship": (0.2, 0.6, 0.1, 0.1),
    "exploratory": (0.25, 0.25, 0.25, 0.25),  # complex/default weights
}

MIN_CONFIDENCE_FOR_SPECIALIZATION = 0.6  # adaptive.rs:83


def select_strategy_weights(query_type: str, confidence: float
                            ) -> tuple[float, float, float, float]:
    """retrieval/adaptive.rs:195-209 — low confidence → balanced
    complex weights; otherwise the per-type table."""
    if confidence < MIN_CONFIDENCE_FOR_SPECIALIZATION:
        return ADAPTIVE_WEIGHT_TABLES["exploratory"]
    return ADAPTIVE_WEIGHT_TABLES.get(
        query_type, ADAPTIVE_WEIGHT_TABLES["exploratory"])


# --- fusion + diversity (adaptive.rs:220-298) ------------------------------


@dataclass
class Candidate:
    id: str
    score: float
    entities: tuple[str, ...] = ()


def cross_strategy_fusion(results: list[Candidate],
                          max_results: int) -> list[Candidate]:
    """retrieval/adaptive.rs:220-253 — dedupe by id keeping the HIGHER
    scored copy (in encounter order), then stable sort by score desc,
    then diversity-aware selection."""
    seen: dict[str, float] = {}
    dedup: list[Candidate] = []
    for r in results:
        if r.id in seen:
            if r.score > seen[r.id]:
                seen[r.id] = r.score
                dedup = [d for d in dedup if d.id != r.id]
                dedup.append(r)
        else:
            seen[r.id] = r.score
            dedup.append(r)
    dedup.sort(key=lambda c: -c.score)  # stable, like rust sort_by
    return diversity_aware_selection(dedup, max_results)


def diversity_aware_selection(results: list[Candidate],
                              max_results: int) -> list[Candidate]:
    """retrieval/adaptive.rs:256-298 verbatim: keep a result when its
    score > 0.8 OR it introduces a new entity OR fewer than
    ``max_results/2`` are selected so far; then backfill skipped ones
    in rank order until ``max_results``."""
    selected: list[Candidate] = []
    selected_entities: set[str] = set()
    for r in results:
        if len(selected) >= max_results:
            break
        has_new = any(e not in selected_entities for e in r.entities)
        if r.score > 0.8 or has_new or len(selected) < max_results // 2:
            selected_entities.update(r.entities)
            selected.append(r)
    if len(selected) < max_results:
        chosen = {s.id for s in selected}
        for r in results:
            if len(selected) >= max_results:
                break
            if r.id not in chosen:
                selected.append(r)
                chosen.add(r.id)
    return selected
