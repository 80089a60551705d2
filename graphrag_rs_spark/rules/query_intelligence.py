"""Query-intelligence rule twins (reranking / routing / rewriting).

Pure-Python re-implementations of three deterministic query-side modules
of the reference, used both as the single-process oracle for tests and
inside Arrow-batched UDFs where the logic is order-sensitive:

* ``cross_encoder_relevance`` — reranking/cross_encoder.rs:104-144
  (ConfidenceCrossEncoder::calculate_relevance): token-Jaccard (0.7) +
  capped length factor (0.3), optionally squashed through the sigmoid
  ``1/(1+exp(-5*(raw-0.5)))``. Tokens are whitespace-split and
  CASE-SENSITIVE exactly as the reference's ``split_whitespace``.
* ``analyze_query_complexity`` — query/adaptive_routing.rs:104-200
  (QueryComplexityAnalyzer): weighted keyword/length/entity scores →
  five-way complexity class → hierarchical level
  (adaptive_routing.rs:63-73).
* ``rewrite_query`` — query/intelligence.rs:92-290 (QueryIntelligence):
  normalize → detect type → first-matching-template rewrite → in-order
  synonym expansion with order-sensitive dedupe → stop-word key terms →
  specificity/relevance confidence.

Scores are computed in f64 (the reference uses f32); every pinned test
vector keeps a safe margin from the class thresholds so the widened
precision can never flip a verdict.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

# --- Cross-encoder rerank (reranking/cross_encoder.rs) -------------------


def cross_encoder_relevance(query: str, document: str,
                            normalize: bool = True) -> float:
    """reranking/cross_encoder.rs:104-144.

    Token sets are case-sensitive whitespace splits; Jaccard over the
    DISTINCT tokens, length factor over the NON-distinct document token
    count. Empty query or document returns 0.0 raw (skipping the
    sigmoid), exactly like the reference's early return.
    """
    q_tokens = query.split()
    d_tokens = document.split()
    if not q_tokens or not d_tokens:
        return 0.0
    q_set = set(q_tokens)
    d_set = set(d_tokens)
    inter = len(q_set & d_set)
    union = len(q_set) + len(d_set) - inter
    jaccard = inter / union if union > 0 else 0.0
    length_factor = min(len(d_tokens) / 100.0, 1.0)
    raw = jaccard * 0.7 + length_factor * 0.3
    if normalize:
        return 1.0 / (1.0 + math.exp(-5.0 * (raw - 0.5)))
    return raw


# --- Adaptive query routing (query/adaptive_routing.rs) ------------------

BROAD_KEYWORDS = (
    "overview", "summary", "summarize", "main", "general", "all",
    "themes", "topics", "overall", "broadly", "big picture",
    "what are", "list all", "show me all",
)  # adaptive_routing.rs:90-94

SPECIFIC_KEYWORDS = (
    "relationship between", "how does", "why does", "specific",
    "detail", "exactly", "precisely", "what is the connection",
    "explain how", "describe the", "between", "and",
)  # adaptive_routing.rs:95-99

COMPLEXITY_LEVELS = ("very_broad", "broad", "medium", "specific",
                     "very_specific")


@dataclass
class RoutingConfig:
    """adaptive_routing.rs:14-45 defaults."""

    default_level: int = 1
    max_level: int = 3
    keyword_weight: float = 0.5
    length_weight: float = 0.3
    entity_weight: float = 0.2


def _keyword_score(query_lower: str) -> float:
    """adaptive_routing.rs:133-158 — mean of ±1 over MATCHED keywords."""
    score = 0.0
    matches = 0
    for kw in BROAD_KEYWORDS:
        if kw in query_lower:
            score += 1.0
            matches += 1
    for kw in SPECIFIC_KEYWORDS:
        if kw in query_lower:
            score -= 1.0
            matches += 1
    return score / matches if matches else 0.0


def _length_score(query: str) -> float:
    """adaptive_routing.rs:161-174 — short→broad, long→specific."""
    n = len(query.split())
    if 1 <= n <= 3:
        return 0.5
    if 4 <= n <= 5:
        return 0.2
    if 6 <= n <= 7:
        return 0.0
    if 8 <= n <= 10:
        return -0.3
    return -0.5  # 0 words falls here too (rust `_` arm)


def _entity_score(query_lower: str) -> float:
    """adaptive_routing.rs:177-193 — quoted phrases / 'and' / 'between'."""
    indicators = (
        query_lower.count('"') // 2
        + query_lower.count(" and ")
        + query_lower.count("between")
    )
    if indicators == 0:
        return 0.3
    if indicators == 1:
        return 0.0
    if indicators == 2:
        return -0.4
    return -0.7


def _complexity_of(total: float) -> str:
    """adaptile_routing.rs:118-128 score→class thresholds."""
    if total >= 0.7:
        return "very_broad"
    if total >= 0.4:
        return "broad"
    if total >= -0.2:
        return "medium"
    if total >= -0.5:
        return "specific"
    return "very_specific"


def _level_of(complexity: str, max_level: int) -> int:
    """adaptive_routing.rs:63-73 (QueryComplexity::to_level)."""
    if complexity == "very_broad":
        return max(max_level, 2)
    if complexity == "broad":
        return max(max_level - 1, 1)
    if complexity == "medium":
        return 1
    return 0


def analyze_query_complexity(query: str,
                             config: RoutingConfig | None = None) -> dict:
    """adaptive_routing.rs:104-130 + 196-200 (analyze + suggest_level)."""
    config = config or RoutingConfig()
    query_lower = query.lower()
    kw = _keyword_score(query_lower)
    ln = _length_score(query)
    en = _entity_score(query_lower)
    total = (kw * config.keyword_weight + ln * config.length_weight
             + en * config.entity_weight)
    complexity = _complexity_of(total)
    return {
        "keyword_score": kw,
        "length_score": ln,
        "entity_score": en,
        "total_score": total,
        "complexity": complexity,
        "suggested_level": _level_of(complexity, config.max_level),
    }


# --- Query intelligence / rewriting (query/intelligence.rs) --------------

DEFAULT_SYNONYMS: dict[str, list[str]] = {
    # intelligence.rs:292-303 (load_default_synonyms)
    "find": ["search", "locate"],
    "person": ["individual", "people"],
    "company": ["organization", "business", "firm"],
    "show": ["display", "present"],
    "get": ["retrieve", "fetch"],
    "large": ["big", "huge", "significant"],
    "small": ["tiny", "minor"],
    "important": ["significant", "critical", "key"],
}

DEFAULT_TEMPLATES: tuple[tuple[str, str, str], ...] = (
    # intelligence.rs:306-329 (pattern, query_type, rewrite)
    ("who is", "entity_lookup", "entity:"),
    ("what is", "entity_lookup", "define:"),
    ("how many", "aggregation", "count:"),
    ("compare", "comparison", "compare:"),
)

INTEL_STOP_WORDS = frozenset({
    # intelligence.rs:332-342
    "a", "an", "and", "are", "as", "at", "be", "by", "for",
    "from", "has", "he", "in", "is", "it", "its", "of", "on",
    "that", "the", "to", "was", "will", "with",
})


def detect_query_type(query: str) -> str:
    """intelligence.rs:170-229 — FIRST match wins, relationship probes
    run before entity lookup (the rust comment calls this out)."""
    q = query.lower()
    if ("relationship between" in q or "how does" in q
            or "related to" in q or "connection between" in q):
        return "relationship"
    if q.startswith("who is") or q.startswith("what is") \
            or q.startswith("define"):
        return "entity_lookup"
    if (q.startswith("how many") or q.startswith("count")
            or "total" in q or "sum" in q or "average" in q):
        return "aggregation"
    if ("compare" in q or "difference between" in q or "versus" in q
            or "vs" in q):
        return "comparison"
    if ("when" in q or "before" in q or "after" in q or "during" in q
            or "timeline" in q):
        return "temporal"
    if ("why" in q or "because" in q or "cause" in q or "reason" in q
            or "led to" in q):
        return "causal"
    return "general"


@dataclass
class QueryIntelligence:
    """intelligence.rs:14-20 state: synonyms + templates + feedback."""

    synonyms: dict[str, list[str]] = field(
        default_factory=lambda: dict(DEFAULT_SYNONYMS))
    templates: tuple[tuple[str, str, str], ...] = DEFAULT_TEMPLATES
    relevance_scores: dict[str, float] = field(default_factory=dict)

    def add_synonym(self, term: str, synonyms: list[str]) -> None:
        """intelligence.rs:126-129 (term lowered on insert)."""
        self.synonyms[term.lower()] = list(synonyms)

    def record_feedback(self, term: str, score: float) -> None:
        """intelligence.rs:140-146 — equal-weight running average."""
        current = self.relevance_scores.get(term, 0.5)
        self.relevance_scores[term] = current * 0.5 + score * 0.5

    def get_relevance(self, term: str) -> float:
        """intelligence.rs:155-157 (0.5 default)."""
        return self.relevance_scores.get(term, 0.5)

    # -- pipeline (intelligence.rs:92-118) --

    def rewrite_query(self, query: str) -> dict:
        normalized = query.strip().lower()
        query_type = detect_query_type(normalized)
        rewritten = self._apply_templates(normalized, query_type)
        expanded = self._expand_synonyms(rewritten)
        expanded_terms = [w for w in expanded.split()
                          if w not in INTEL_STOP_WORDS]
        confidence = self._confidence(normalized, expanded_terms)
        return {
            "original": query,
            "rewritten": expanded,
            "query_type": query_type,
            "expanded_terms": expanded_terms,
            "confidence": confidence,
        }

    def _apply_templates(self, query: str, query_type: str) -> str:
        """intelligence.rs:232-239 — first template whose type matches
        AND whose pattern occurs; replace ALL occurrences (rust
        ``str::replace`` replaces every non-overlapping match)."""
        for pattern, ttype, rewrite in self.templates:
            if ttype == query_type and pattern in query:
                return query.replace(pattern, rewrite)
        return query

    def _expand_synonyms(self, query: str) -> str:
        """intelligence.rs:242-260 — append synonyms after their word,
        skipping any synonym already present in the OUTPUT list (an
        order-sensitive dedupe over everything emitted so far, including
        original words)."""
        out: list[str] = []
        for word in query.split():
            out.append(word)
            for syn in self.synonyms.get(word, ()):
                if syn not in out:
                    out.append(syn)
        return " ".join(out)

    def _confidence(self, normalized: str, terms: list[str]) -> float:
        """intelligence.rs:273-290 — 0.6·specificity + 0.4·feedback."""
        if not terms:
            return 0.5
        word_count = len(normalized.split())
        term_count = len(terms)
        specificity = min(term_count / (word_count + 1.0), 1.0)
        relevance = sum(self.get_relevance(t) for t in terms) / term_count
        return specificity * 0.6 + relevance * 0.4


def rewrite_query(query: str,
                  engine: QueryIntelligence | None = None) -> dict:
    """Module-level convenience mirroring ``QueryIntelligence::new``."""
    return (engine or QueryIntelligence()).rewrite_query(query)
