"""ROGRAG query-processing rules (pure Python, executor-safe).

Port of the reference's deterministic ROGRAG components
(graphrag-rs graphrag-core/src/rograg/):

* intent classification — keyword + regex pattern scoring with refusal /
  ambiguity detection (intent_classifier.rs:312-614)
* logic-form parsing — pattern-based query → (predicate, arguments)
  (logic_form.rs:403-558)
* query decomposition — semantic / syntactic / hybrid strategies
  (decomposer.rs:304-699)
* fuzzy text similarity — 0.4·Jaccard + 0.4·containment + 0.2·Levenshtein
  (fuzzy_matcher.rs:540-639)

These are the RULE twins: each function is a plain-Python single-value
kernel used both by the Arrow-batched Spark operators
(operators/rograg.py) and directly by the unit tests that pin the ported
reference vectors. No LLM anywhere — the reference's rograg feature is
entirely pattern-based.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --------------------------------------------------------------------------
# Intent classification (intent_classifier.rs)
# --------------------------------------------------------------------------

INTENTS = (
    "Factual",
    "Definitional",
    "Relational",
    "Temporal",
    "Causal",
    "Comparative",
    "Summary",
)

# (keywords, regex patterns) per intent — verbatim from
# intent_classifier.rs:314-407. Scoring: keyword fraction * 0.5 + regex
# fraction * 0.5, capped at 1.0 (rs:536-568).
_INTENT_PATTERNS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "Factual": (
        ("what", "which", "how many", "how much"),
        (
            r"\bwhat (?:is|are|was|were)\b",
            r"\bwhich (?:is|are|was|were)\b",
            r"\bhow many\b",
            r"\bhow much\b",
        ),
    ),
    "Definitional": (
        ("define", "definition", "meaning", "explain", "what is"),
        (
            r"\bdefine\b",
            r"\bdefinition of\b",
            r"\bmeaning of\b",
            r"\bexplain what\b",
            r"\bwhat (?:is|are) (?:the )?(?:concept|idea|notion) of\b",
        ),
    ),
    "Relational": (
        ("relationship", "related", "connection", "between", "and"),
        (
            r"\brelationship between\b",
            r"\bhow (?:is|are) .+ related to\b",
            r"\bconnection between\b",
            r"\b\w+ and \w+\b",
        ),
    ),
    "Temporal": (
        ("when", "time", "date", "year", "before", "after", "during"),
        (
            r"\bwhen (?:did|was|were|will|is|are)\b",
            r"\bwhat (?:time|date|year)\b",
            r"\bbefore .+ happened\b",
            r"\bafter .+ happened\b",
            r"\bduring .+ period\b",
        ),
    ),
    "Causal": (
        ("why", "because", "cause", "reason", "result", "due to"),
        (
            r"\bwhy (?:did|was|were|is|are|do|does)\b",
            r"\bwhat (?:caused|causes)\b",
            r"\breason for\b",
            r"\bdue to what\b",
            r"\bwhat led to\b",
        ),
    ),
    "Comparative": (
        ("compare", "difference", "versus", "vs", "better", "worse", "similar"),
        (
            r"\bcompare .+ (?:to|with|and)\b",
            r"\bdifference between\b",
            r"\b.+ (?:versus|vs) .+\b",
            r"\bwhich is (?:better|worse)\b",
            r"\bhow (?:similar|different)\b",
        ),
    ),
    "Summary": (
        ("summarize", "overview", "summary", "tell me about", "describe"),
        (
            r"\bsummarize\b",
            r"\bgive (?:me )?(?:an )?overview\b",
            r"\btell me about\b",
            r"\bdescribe .+\b",
            r"\bwhat (?:can you tell me )?about\b",
        ),
    ),
}

_COMPILED_INTENTS: dict[str, tuple[tuple[str, ...], tuple[re.Pattern, ...]]] = {
    intent: (kws, tuple(re.compile(p) for p in pats))
    for intent, (kws, pats) in _INTENT_PATTERNS.items()
}

# intent_classifier.rs:411-414
_INAPPROPRIATE = re.compile(r"\b(?:hate|violence|harm|illegal|inappropriate)\b")


@dataclass
class IntentResult:
    """Mirror of intent_classifier.rs IntentResult (rs:116-147)."""

    primary_intent: str
    confidence: float
    should_refuse: bool
    refusal_reason: str | None
    suggested_reformulation: str | None
    complexity_score: float
    secondary_intents: list[tuple[str, float]] = field(default_factory=list)


def intent_score(query_lower: str, intent: str) -> float:
    """Pattern score for one intent (intent_classifier.rs:536-568)."""
    keywords, patterns = _COMPILED_INTENTS[intent]
    score = 0.0
    kw_matches = sum(1 for kw in keywords if kw in query_lower)
    if kw_matches > 0:
        score += (kw_matches / len(keywords)) * 0.5
    rx_matches = sum(1 for rx in patterns if rx.search(query_lower))
    if rx_matches > 0:
        score += (rx_matches / len(patterns)) * 0.5
    return min(score, 1.0)


def query_complexity(query_lower: str) -> float:
    """intent_classifier.rs:576-592 calculate_complexity."""
    words = query_lower.split()
    word_count = len(words)
    sentence_count = max(
        sum(1 for c in query_lower if c in ".?!"), 1
    )
    alpha = sum(1 for c in query_lower if c.isalpha())
    avg_word_length = alpha / max(word_count, 1)

    length_c = min(word_count / 20.0, 1.0)
    sentence_c = min(sentence_count / 3.0, 1.0)
    word_len_c = min(avg_word_length / 8.0, 1.0)
    has_conj = (" and " in query_lower) or (" or " in query_lower) or (
        " but " in query_lower
    )
    has_sub = (" because " in query_lower) or (" since " in query_lower) or (
        " although " in query_lower
    )
    construct_c = 0.3 if (has_conj or has_sub) else 0.0
    return min(
        length_c * 0.3 + sentence_c * 0.2 + word_len_c * 0.2 + construct_c, 1.0
    )


def suggest_reformulation(query: str) -> str:
    """intent_classifier.rs:595-614 (first-match ladder)."""
    q = query.lower()
    if q.startswith("tell me about"):
        return (
            "Try asking a more specific question like 'What is...?' "
            "or 'How does...?'"
        )
    if " and " in q:
        return (
            "Try breaking your question into separate parts or focus on "
            "one aspect"
        )
    if len(query.split()) > 20:
        return "Try using a shorter, more focused question"
    if not query.endswith(("?", ".", "!")):
        return "Try phrasing your request as a clear question"
    return "Try being more specific about what information you're looking for"


def classify_intent(
    query: str,
    refusal_threshold: float = 0.8,
    enable_inappropriate_detection: bool = True,
    enable_ambiguity_detection: bool = True,
    suggest_reformulations: bool = True,
) -> IntentResult:
    """intent_classifier.rs:450-533 classify.

    Quirk preserved: ``should_refuse`` compares the PRIMARY score against
    ``refusal_threshold`` (0.8 default), so moderately-confident
    classifications still refuse — exactly the reference's behavior.
    """
    query_lower = query.lower()

    if enable_inappropriate_detection and _INAPPROPRIATE.search(query_lower):
        return IntentResult(
            primary_intent="Inappropriate",
            confidence=1.0,
            should_refuse=True,
            refusal_reason="Query contains inappropriate content",
            suggested_reformulation=None,
            complexity_score=0.0,
        )

    scores = [
        (intent, s)
        for intent in INTENTS
        if (s := intent_score(query_lower, intent)) > 0.0
    ]
    # rs:477-478 sorts descending by score only; Python's stable sort then
    # preserves INTENTS declaration order for ties, matching the intent
    # registration order semantics of the reference's HashMap iteration
    # closely enough that ties are deterministic HERE (the reference's
    # HashMap tie order is unspecified — we pin a deterministic choice).
    scores.sort(key=lambda t: -t[1])

    if not scores:
        return IntentResult(
            primary_intent="Ambiguous",
            confidence=0.0,
            should_refuse=True,
            refusal_reason="Unable to understand the query intent",
            suggested_reformulation=(
                suggest_reformulation(query) if suggest_reformulations else None
            ),
            complexity_score=query_complexity(query_lower),
        )

    primary_intent, primary_score = scores[0]
    secondary = scores[1:3]
    is_ambiguous = enable_ambiguity_detection and any(
        s > primary_score * 0.8 for _, s in secondary
    )
    final_intent = "Ambiguous" if is_ambiguous else primary_intent
    should_refuse = primary_score < refusal_threshold or is_ambiguous
    refusal_reason = None
    if should_refuse:
        refusal_reason = (
            "Query intent is ambiguous - please be more specific"
            if is_ambiguous
            else "Insufficient confidence in understanding the query"
        )
    return IntentResult(
        primary_intent=final_intent,
        confidence=primary_score,
        should_refuse=should_refuse,
        refusal_reason=refusal_reason,
        suggested_reformulation=(
            suggest_reformulation(query)
            if should_refuse and suggest_reformulations
            else None
        ),
        complexity_score=query_complexity(query_lower),
        secondary_intents=secondary,
    )


# --------------------------------------------------------------------------
# Logic-form parsing (logic_form.rs PatternBasedParser)
# --------------------------------------------------------------------------

# (regex, predicate, [variable names per capture group]) — logic_form.rs:404-496.
# First match wins (rs:505-544).
_LOGIC_PATTERNS: tuple[tuple[re.Pattern, str, tuple[str, ...]], ...] = (
    (re.compile(r"(?i)what (?:is|are) (?:the )?(.+)\??"), "Is", ("X",)),
    (re.compile(r"(?i)who (?:is|are) (?:the )?(.+)\??"), "Is", ("X",)),
    (
        re.compile(r"(?i)how (?:is|are) (.+?) (?:related to|connected to) (.+)\??"),
        "Related",
        ("X", "Y"),
    ),
    (
        re.compile(r"(?i)when (?:did|does|will) (.+?) (?:happen|occur)\??"),
        "Happened",
        ("X",),
    ),
    (
        re.compile(r"(?i)why (?:did|does) (.+?) (?:cause|lead to) (.+)\??"),
        "Caused",
        ("X", "Y"),
    ),
    (
        re.compile(
            r"(?i)compare (.+?) (?:and|with|to) (.+)(?:\s+(?:on|in terms of) (.+))?\??"
        ),
        "Compare",
        ("X", "Y"),
    ),
)


@dataclass
class LogicForm:
    """Mirror of logic_form.rs LogicFormQuery (predicate + entity args)."""

    predicate: str
    arguments: list[tuple[str, str]]  # (variable, value)
    query_type: str = "Select"
    confidence: float = 0.8  # rs:541 default for pattern matches


def parse_logic_form(query: str) -> LogicForm | None:
    """Pattern-based parse, first match wins (logic_form.rs:504-547).

    Quirk preserved: the reference's ``(.+)\\??`` tail is greedy, so a
    trailing '?' stays INSIDE the captured argument (regex crate and
    Python agree here); execution then relies on substring containment,
    which still matches. We strip nothing.
    """
    for rx, predicate, variables in _LOGIC_PATTERNS:
        m = rx.search(query)
        if m is None:
            continue
        arguments = []
        for i, var in enumerate(variables, start=1):
            captured = m.group(i)
            if captured is not None and captured.strip():
                arguments.append((var, captured.strip()))
        return LogicForm(predicate=predicate, arguments=arguments)
    return None


def logic_name_similarity(query_name: str, entity_name: str) -> float:
    """logic_form.rs:760-780 calculate_name_similarity."""
    q = query_name.lower()
    e = entity_name.lower()
    if q == e:
        return 1.0
    if q in e or e in q:
        return 0.8
    qw = set(q.split())
    ew = set(e.split())
    union = len(qw | ew)
    return (len(qw & ew) / union) if union else 0.0


# --------------------------------------------------------------------------
# Query decomposition (decomposer.rs)
# --------------------------------------------------------------------------

_SEM_WHO_WHAT = re.compile(r"\b(who|what) is (.+?) and (.+)")
_SEM_RELATED = re.compile(r"\bhow (?:is|are) (.+?) (?:related to|connected to) (.+)")

# decomposer.rs:488-499 clause separators, in declaration order
_CLAUSE_SEPARATORS = (
    "and", "or", "but", ",", ";",
    "also", "furthermore", "moreover", "however", "therefore",
)


@dataclass
class Subquery:
    id: str
    text: str
    query_type: str
    priority: float
    dependencies: list[str] = field(default_factory=list)


@dataclass
class Decomposition:
    original_query: str
    subqueries: list[Subquery]
    strategy_used: str
    confidence: float


def _single(query: str, strategy: str = "None") -> Decomposition:
    """decomposer.rs:716-736 single_query: one subquery, confidence 1.0."""
    return Decomposition(
        original_query=query,
        subqueries=[
            Subquery(id="single", text=query, query_type="Entity", priority=1.0)
        ],
        strategy_used=strategy,
        confidence=1.0,
    )


def decompose_semantic(query: str) -> Decomposition:
    """decomposer.rs:373-439 SemanticQueryDecomposer.decompose."""
    subqueries: list[Subquery] = []
    confidence = 0.0

    m = _SEM_WHO_WHAT.search(query)
    if m:
        texts = [f"{m.group(1)} is {m.group(2)}", m.group(3)]
        sub_type = "Entity"
    else:
        m = _SEM_RELATED.search(query)
        if m:
            texts = [
                f"What is {m.group(1)}",
                f"What is {m.group(2)}",
                f"How are {m.group(1)} and {m.group(2)} related",
            ]
            sub_type = "Relationship"
        else:
            texts = []
            sub_type = "Entity"
    for idx, text in enumerate(texts):
        if text.strip():
            subqueries.append(
                Subquery(
                    id=f"sem_{idx}",
                    text=text.strip(),
                    query_type=sub_type,
                    priority=1.0 - idx * 0.1,
                    dependencies=[f"sem_{idx - 1}"] if idx > 0 else [],
                )
            )
    if subqueries:
        confidence = 0.8

    if not subqueries:
        # conjunction fallback (rs:402-426): first conjunction contained in
        # the query splits it; confidence 0.5
        for conjunction in ("and", "or", "but", "also", "furthermore"):
            if conjunction in query.lower():
                parts = query.split(conjunction)
                if len(parts) > 1:
                    for idx, part in enumerate(parts):
                        text = part.strip()
                        if text:
                            subqueries.append(
                                Subquery(
                                    id=f"sem_fallback_{idx}",
                                    text=text,
                                    query_type="Entity",
                                    priority=1.0 - idx * 0.2,
                                )
                            )
                    confidence = 0.5
                    break

    if not subqueries:
        return _single(query)
    return Decomposition(query, subqueries, "Semantic", confidence)


def _clause_boundaries(query: str) -> list[int]:
    """decomposer.rs:503-524 (byte offsets of every separator occurrence)."""
    boundaries = [0]
    q_lower = query.lower()
    for sep in _CLAUSE_SEPARATORS:
        start = 0
        while True:
            pos = q_lower.find(sep, start)
            if pos < 0:
                break
            if pos not in boundaries:
                boundaries.append(pos)
            start = pos + len(sep)
    boundaries.append(len(query))
    return sorted(set(boundaries))


def extract_clauses(query: str) -> list[str]:
    """decomposer.rs:526-553. Quirks preserved: separators are found as
    SUBSTRINGS (no word-boundary check — 'band' contains 'and'), and only
    the leading separator is stripped from each clause."""
    boundaries = _clause_boundaries(query)
    clauses = []
    for start, end in zip(boundaries, boundaries[1:]):
        clause = query[start:end].strip()
        for sep in _CLAUSE_SEPARATORS:
            if clause.lower().startswith(sep):
                clause = clause[len(sep):].strip()
        if clause and len(clause) > 3:
            clauses.append(clause)
    return clauses


def classify_clause(clause: str) -> str:
    """decomposer.rs:555-573 classify_clause_type."""
    c = clause.lower()
    if c.startswith("who") or c.startswith("what person"):
        return "Entity"
    if c.startswith("what"):
        return "Definitional"
    if c.startswith("when"):
        return "Temporal"
    if c.startswith("why") or "because" in c:
        return "Causal"
    if "relation" in c or "connect" in c:
        return "Relationship"
    if "compare" in c or "versus" in c:
        return "Comparative"
    return "Attribute"


def decompose_syntactic(query: str) -> Decomposition:
    """decomposer.rs:579-607 SyntacticQueryDecomposer.decompose."""
    clauses = extract_clauses(query)
    if len(clauses) <= 1:
        return _single(query)
    subqueries = [
        Subquery(
            id=f"syn_{idx}",
            text=clause,
            query_type=classify_clause(clause),
            priority=1.0 - idx * 0.1,
        )
        for idx, clause in enumerate(clauses)
    ]
    confidence = 0.7 if len(subqueries) > 1 else 0.3
    return Decomposition(query, subqueries, "Syntactic", confidence)


def decompose_hybrid(query: str) -> Decomposition:
    """decomposer.rs:667-690: semantic if its patterns match AND
    confidence > 0.6, else syntactic if any separator present, else
    single."""
    if _SEM_WHO_WHAT.search(query) or _SEM_RELATED.search(query):
        sem = decompose_semantic(query)
        if sem.confidence > 0.6:
            sem.strategy_used = "Hybrid"
            return sem
    if any(sep in query.lower() for sep in _CLAUSE_SEPARATORS):
        syn = decompose_syntactic(query)
        syn.strategy_used = "Hybrid"
        return syn
    return _single(query, "Hybrid")


# --------------------------------------------------------------------------
# Fuzzy text similarity (fuzzy_matcher.rs:540-639)
# --------------------------------------------------------------------------


def fuzzy_jaccard(text1: str, text2: str) -> float:
    """Word-set Jaccard (fuzzy_matcher.rs:554-566); inputs pre-lowered."""
    w1, w2 = set(text1.split()), set(text2.split())
    union = len(w1 | w2)
    return (len(w1 & w2) / union) if union else 0.0


def fuzzy_containment(text1: str, text2: str) -> float:
    """fuzzy_matcher.rs:569-584: intersection / smaller set size."""
    w1, w2 = set(text1.split()), set(text2.split())
    if not w1 and not w2:
        return 1.0
    smaller = min(len(w1), len(w2))
    if smaller == 0:
        return 0.0
    return len(w1 & w2) / smaller


def fuzzy_levenshtein_sim(text1: str, text2: str) -> float:
    """fuzzy_matcher.rs:587-624: 1 - d/max_len over CHARACTERS.

    NB the reference divides by max BYTE length (str::len) while the DP
    runs over chars; for ASCII they coincide. We use char length for both
    (the sane reading); the unit vectors pin ASCII cases where they agree.
    """
    if not text1 and not text2:
        return 1.0
    n1, n2 = len(text1), len(text2)
    # single-row DP
    prev = list(range(n2 + 1))
    for i in range(1, n1 + 1):
        cur = [i] + [0] * n2
        c1 = text1[i - 1]
        for j in range(1, n2 + 1):
            cost = 0 if c1 == text2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return 1.0 - prev[n2] / max(n1, n2)


def fuzzy_text_similarity(text1: str, text2: str) -> float:
    """fuzzy_matcher.rs:540-551: 0.4·jaccard + 0.4·containment + 0.2·lev
    over lowercased inputs."""
    t1, t2 = text1.lower(), text2.lower()
    return (
        fuzzy_jaccard(t1, t2) * 0.4
        + fuzzy_containment(t1, t2) * 0.4
        + fuzzy_levenshtein_sim(t1, t2) * 0.2
    )


def word_overlap(words1: list[str], words2: list[str]) -> float:
    """fuzzy_matcher.rs:627-639: |set∩| / min(LIST lengths) — note the
    denominator uses the raw list lengths, not the set sizes (reference
    quirk, preserved)."""
    s1, s2 = set(words1), set(words2)
    min_size = min(len(words1), len(words2))
    if min_size == 0:
        return 0.0
    return len(s1 & s2) / min_size


# --------------------------------------------------------------------------
# Query / response validation (validator.rs)
# --------------------------------------------------------------------------

# validator.rs:269-274
_SAFETY_PATTERNS = (
    re.compile(r"\b(?:harm|violence|illegal|inappropriate|offensive)\b"),
    re.compile(r"\b(?:hate|discrimination|bias|prejudice)\b"),
    re.compile(r"\b(?:private|confidential|secret|classified)\b"),
)


@dataclass
class ValidationIssue:
    issue_type: str
    severity: str
    description: str


@dataclass
class ValidationResult:
    is_valid: bool
    validation_score: float
    issues: list[ValidationIssue] = field(default_factory=list)


def validate_query(query: str, enable_safety_checks: bool = True) -> ValidationResult:
    """validator.rs:295-366 validate_query.

    Critical issues (empty query) zero the score and invalidate; each
    non-critical issue costs 0.1 off 1.0, floor 0.2 (the reference caps
    the penalty at 0.8)."""
    issues: list[ValidationIssue] = []
    if not query.strip():
        issues.append(ValidationIssue("Length", "Critical", "Query is empty"))
    elif len(query) > 1000:
        issues.append(ValidationIssue("Length", "Medium", "Query is very long"))
    if enable_safety_checks:
        q = query.lower()
        if any(p.search(q) for p in _SAFETY_PATTERNS):
            issues.append(
                ValidationIssue(
                    "Safety",
                    "High",
                    "Query contains potentially inappropriate content",
                )
            )
    if not any(c.isalpha() for c in query):
        issues.append(
            ValidationIssue(
                "Format", "High", "Query contains no alphabetic characters"
            )
        )
    has_critical = any(i.severity == "Critical" for i in issues)
    score = 0.0 if has_critical else 1.0 - min(len(issues) * 0.1, 0.8)
    return ValidationResult(not has_critical, score, issues)


# validator.rs:458-463
_CONTRADICTION_PATTERNS = (
    ("not", "is"),
    ("never", "always"),
    ("none", "all"),
    ("impossible", "possible"),
)


def factual_consistency_score(content: str) -> float:
    """validator.rs:452-479: 1 − contradiction-sentence density, where a
    'contradiction' is a sentence containing both halves of any pair.
    Quirk preserved: substring checks, so "not"+"is" fires on most
    negated sentences and "impossible" alone fires (contains "possible")."""
    sentences = re.split(r"[.!?]", content)
    count = 0
    for s in sentences:
        sl = s.lower()
        for neg, pos in _CONTRADICTION_PATTERNS:
            if neg in sl and pos in sl:
                count += 1
    return 1.0 - min(count / max(len(sentences), 1), 1.0)


def completeness_score(
    content: str, n_sources: int, n_subquery_results: int
) -> float:
    """validator.rs:482-489: mean of length (cap 100 chars), source
    (cap 2), and subquery (cap 1 — >1 results max it) scores."""
    length_score = 1.0 if len(content) > 100 else len(content) / 100.0
    source_score = 1.0 if n_sources > 2 else n_sources / 2.0
    subquery_score = 1.0 if n_subquery_results > 1 else float(n_subquery_results)
    return (length_score + source_score + subquery_score) / 3.0


def readability_score(content: str) -> float:
    """validator.rs:492-506: sentence-length / word-length band check."""
    words = content.split()
    word_count = len(words)
    sentence_count = max(sum(1 for c in content if c in ".!?"), 1)
    avg_wps = word_count / sentence_count
    alpha = sum(1 for c in content if c.isalpha())
    avg_wl = alpha / max(word_count, 1)
    sentence_score = 0.5 if avg_wps > 30.0 else 1.0
    word_score = 0.7 if avg_wl > 8.0 else 1.0
    return (sentence_score + word_score) / 2.0


def source_credibility_score(sources: list[str]) -> float:
    """validator.rs:509-524: count score (cap 5) averaged with 10-char-
    prefix diversity."""
    if not sources:
        return 0.0
    count_score = min(len(sources) / 5.0, 1.0)
    prefixes = {s[:10] for s in sources}
    diversity = len(prefixes) / len(sources)
    return (count_score + diversity) / 2.0


_MATCH_TYPE_WEIGHT = {
    "ExactEntity": 1.0,
    "PartialEntity": 0.8,
    "SemanticEntity": 0.7,
    "ChunkContent": 0.6,
    "RelatedConcept": 0.5,
}


def fuzzy_overall_confidence(matches: list[tuple[float, str]]) -> float:
    """fuzzy_matcher.rs:642-685: position- and type-weighted mean of
    similarities. ``matches`` = [(similarity, match_type)] already sorted
    descending by similarity."""
    if not matches:
        return 0.0
    num = 0.0
    den = 0.0
    for idx, (sim, mtype) in enumerate(matches):
        w = (1.0 / (idx + 1.0)) * _MATCH_TYPE_WEIGHT[mtype]
        num += sim * w
        den += w
    return num / den if den > 0 else 0.0
