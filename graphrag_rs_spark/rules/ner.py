"""Pure-Python port of the reference's rule-based custom NER
(graphrag-rs nlp/custom_ner.rs:68-380).

Rule types and their fixed match confidences (custom_ner.rs:169-340):
ExactMatch 1.0, Regex 0.9, Prefix 0.7, Suffix 0.7, Contains 0.6,
Dictionary 0.95, Contextual 0.85. Rules are applied in priority order
(higher first, stable — custom_ner.rs:134-140); overlapping matches are
resolved by a stable sort on (start asc, confidence desc) then a greedy
left-to-right non-overlap scan (custom_ner.rs:350-376).

These rules run identically inside the Spark pandas UDF
(operators/ner.py) and in the pytest oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

RULE_TYPES = (
    "exact_match", "regex", "prefix", "suffix", "contains", "dictionary",
    "contextual",
)

_CONFIDENCE = {
    "exact_match": 1.0,
    "regex": 0.9,
    "prefix": 0.7,
    "suffix": 0.7,
    "contains": 0.6,
    "dictionary": 0.95,
    "contextual": 0.85,
}


@dataclass(frozen=True)
class ExtractionRule:
    """custom_ner.rs:69-88 ExtractionRule."""

    name: str
    entity_type: str
    rule_type: str
    pattern: str
    min_confidence: float = 0.0
    priority: int = 0
    # dictionary entries for rule_type == 'dictionary'
    # (the reference stores these on the EntityType, custom_ner.rs:284-310)
    dictionary: tuple[str, ...] = field(default=())

    def __post_init__(self) -> None:
        if self.rule_type not in RULE_TYPES:
            raise ValueError(f"unknown rule type {self.rule_type!r}")


@dataclass(frozen=True)
class ExtractedEntity:
    text: str
    entity_type: str
    start: int
    end: int
    confidence: float
    rule_name: str


def _substring_hits(text: str, text_lower: str, needle: str):
    """Non-overlapping case-insensitive substring scan
    (custom_ner.rs:175-190)."""
    start = 0
    n = len(needle)
    if n == 0:
        return
    while True:
        pos = text_lower.find(needle, start)
        if pos < 0:
            return
        yield pos, pos + n
        start = pos + n


def _word_positions(text: str):
    """(word, start, end) for whitespace words, tracking reference's
    ``pos += len + 1`` bookkeeping (custom_ner.rs:221-236) is approximate in
    the original; we use true offsets so mention slices are exact."""
    for m in re.finditer(r"\S+", text):
        yield m.group(0), m.start(), m.end()


def apply_rule(text: str, rule: ExtractionRule) -> list[ExtractedEntity]:
    out: list[ExtractedEntity] = []
    conf = _CONFIDENCE[rule.rule_type]
    lower = text.lower()
    pat = rule.pattern.lower()

    if rule.rule_type == "exact_match":
        for s, e in _substring_hits(text, lower, pat):
            out.append(ExtractedEntity(text[s:e], rule.entity_type, s, e, conf, rule.name))
    elif rule.rule_type == "regex":
        try:
            rx = re.compile(rule.pattern)
        except re.error:
            return []
        for m in rx.finditer(text):
            out.append(
                ExtractedEntity(m.group(0), rule.entity_type, m.start(), m.end(), conf, rule.name)
            )
    elif rule.rule_type in ("prefix", "suffix", "contains"):
        for word, s, e in _word_positions(text):
            wl = word.lower()
            hit = (
                wl.startswith(pat)
                if rule.rule_type == "prefix"
                else wl.endswith(pat)
                if rule.rule_type == "suffix"
                else pat in wl
            )
            if hit:
                out.append(ExtractedEntity(word, rule.entity_type, s, e, conf, rule.name))
    elif rule.rule_type == "dictionary":
        for entry in rule.dictionary:
            for s, e in _substring_hits(text, lower, entry.lower()):
                out.append(
                    ExtractedEntity(text[s:e], rule.entity_type, s, e, conf, rule.name)
                )
    elif rule.rule_type == "contextual":
        parts = rule.pattern.split("|")
        if len(parts) != 3:
            return []
        before, target, after = (p.lower() for p in parts)
        words = list(_word_positions(text))
        for (w0, _, _), (w1, s1, e1), (w2, _, _) in zip(words, words[1:], words[2:]):
            if before in w0.lower() and target in w1.lower() and after in w2.lower():
                out.append(
                    ExtractedEntity(w1, rule.entity_type, s1, e1, conf, rule.name)
                )
    return out


def resolve_overlaps(entities: list[ExtractedEntity]) -> list[ExtractedEntity]:
    """Stable sort (start asc, confidence desc) + greedy non-overlap scan
    (custom_ner.rs:350-376)."""
    ordered = sorted(entities, key=lambda e: (e.start, -e.confidence))
    result: list[ExtractedEntity] = []
    last_end = 0
    for ent in ordered:
        if ent.start < last_end:
            continue
        last_end = ent.end
        result.append(ent)
    return result


def extract(text: str, rules: list[ExtractionRule]) -> list[ExtractedEntity]:
    """Apply rules in priority order (stable desc) then resolve overlaps
    (custom_ner.rs:142-153)."""
    ordered = sorted(rules, key=lambda r: -r.priority)
    hits: list[ExtractedEntity] = []
    for rule in ordered:
        hits.extend(apply_rule(text, rule))
    return resolve_overlaps(hits)
