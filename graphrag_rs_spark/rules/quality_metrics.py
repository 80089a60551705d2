"""ROGRAG response-quality rule twins (rograg/quality_metrics.rs).

Pure-Python re-implementations of the reference's deterministic quality
scoring, used as the single-process oracle for tests. The Spark operator
(operators/quality_metrics.py) re-expresses every formula as JVM column
expressions; these twins pin the semantics row by row.

Faithfulness notes:

* ``content.len()`` / answer_length is Rust BYTE length → UTF-8 bytes.
* the coherence sentence split is Rust ``split(['.','!','?'])``, which
  KEEPS empty trailing/interior pieces ("a. b." → ["a", " b", ""]); the
  denominator counts them.
* repetition's distinct words are CASE-SENSITIVE (taken from the raw
  text), while transition probes lowercase each sentence.
* source-prefix diversity takes the first 5 CHARS of each source id.
* scores compute in f64 (reference f32); test vectors keep margins.
"""

from __future__ import annotations

TRANSITION_WORDS = (
    # quality_metrics.rs:1043-1044
    "however", "therefore", "furthermore", "additionally", "meanwhile",
    "consequently", "moreover", "nevertheless", "thus", "hence",
)

#: AlertThresholds defaults (quality_metrics.rs:480-505)
DEFAULT_MIN_QUALITY = 0.6
DEFAULT_MAX_PROCESSING_MS = 10_000
DEFAULT_MAX_ERROR_RATE = 0.1
DEFAULT_MIN_SUCCESS_RATE = 0.8


def _split_sentences_raw(text: str) -> list[str]:
    """Rust ``split(['.','!','?'])`` twin — keeps empty pieces."""
    out, cur = [], []
    for ch in text:
        if ch in ".!?":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def completeness_score(content: str, n_sources: int,
                       n_subqueries: int) -> float:
    """quality_metrics.rs:1020-1032."""
    length_score = min(len(content.encode("utf-8")) / 500.0, 1.0)
    source_score = min(n_sources / 3.0, 1.0)
    coverage_score = min(n_subqueries / 5.0, 1.0)
    return (length_score + source_score + coverage_score) / 3.0


def coherence_score(content: str) -> float:
    """quality_metrics.rs:1034-1064."""
    sentences = _split_sentences_raw(content)
    if len(sentences) <= 1:
        return 1.0
    transition_count = sum(
        1 for s in sentences
        if any(t in s.lower() for t in TRANSITION_WORDS)
    )
    transition_score = min(transition_count / len(sentences), 1.0)
    words = content.split()
    repetition_score = (len(set(words)) / len(words)) if words else 1.0
    return (transition_score + repetition_score) / 2.0


def relevance_score(query: str, content: str) -> float:
    """quality_metrics.rs:1066-1086 — overlap of >3-byte query words
    with answer words, both lowercased, as sets."""
    qwords = {w for w in query.lower().split() if len(w.encode()) > 3}
    if not qwords:
        return 1.0
    awords = set(content.lower().split())
    return len(qwords & awords) / len(qwords)


def source_credibility(sources: list[str]) -> float:
    """quality_metrics.rs:1088-1104."""
    if not sources:
        return 0.0
    count_score = min(len(sources) / 5.0, 1.0)
    prefixes = {s[:5] for s in sources}
    diversity_score = len(prefixes) / len(sources)
    return (count_score + diversity_score) / 2.0


def response_quality(query: str, content: str, confidence: float,
                     sources: list[str], n_subqueries: int) -> dict:
    """quality_metrics.rs:986-1018 — the five scores + weighted overall."""
    cred = source_credibility(sources)
    accuracy = (confidence + cred) / 2.0
    completeness = completeness_score(content, len(sources), n_subqueries)
    coherence = coherence_score(content)
    relevance = relevance_score(query, content)
    overall = min(
        accuracy * 0.3 + completeness * 0.25 + coherence * 0.2
        + relevance * 0.15 + cred * 0.1,
        1.0,
    )
    return {
        "accuracy_score": accuracy,
        "completeness_score": completeness,
        "coherence_score": coherence,
        "relevance_score": relevance,
        "source_credibility": cred,
        "overall_quality": overall,
    }


def determine_retrieval_strategy(subquery_types: list[str]) -> str:
    """quality_metrics.rs:1106-1129 — fallback > hybrid > logic_form >
    fuzzy_match precedence over the subquery result types."""
    lf = sum(1 for t in subquery_types if t == "logic_form")
    fm = sum(1 for t in subquery_types if t == "fuzzy_match")
    fb = sum(1 for t in subquery_types if t == "fallback")
    if fb > 0:
        return "fallback"
    if lf > 0 and fm > 0:
        return "hybrid"
    if lf > 0:
        return "logic_form"
    return "fuzzy_match"


def improvement_percentage(rograg_value: float, baseline_value: float
                           ) -> float:
    """quality_metrics.rs:1302-1308."""
    if baseline_value == 0.0:
        return 100.0 if rograg_value > 0.0 else 0.0
    return (rograg_value - baseline_value) / baseline_value * 100.0


def statistical_significance(rograg: dict, baseline: dict) -> dict:
    """quality_metrics.rs:1310-1336 — the reference's admitted-heuristic
    p-value estimate, reproduced as specified."""
    denom = (rograg["std_dev_quality"] + baseline["std_dev_quality"]) / 2.0
    effect_size = (
        (rograg["mean_accuracy"] - baseline["mean_accuracy"]) / denom
        if denom != 0.0 else float("inf")
        if rograg["mean_accuracy"] != baseline["mean_accuracy"] else 0.0
    )
    p_acc = 0.01 if abs(effect_size) > 0.5 else 0.1
    p_comp = 0.05 if rograg["mean_completeness"] > baseline[
        "mean_completeness"] else 0.1
    p_coh = 0.05 if rograg["mean_coherence"] > baseline[
        "mean_coherence"] else 0.1
    p_overall = (p_acc + p_comp + p_coh) / 3.0
    return {
        "p_value_accuracy": p_acc,
        "p_value_completeness": p_comp,
        "p_value_coherence": p_coh,
        "p_value_overall": p_overall,
        "is_significant_95": p_overall < 0.05,
        "effect_size": effect_size,
    }
