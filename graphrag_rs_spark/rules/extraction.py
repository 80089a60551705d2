"""Pattern-based entity & relationship extraction rules.

Exact port of graphrag-rs's deterministic ("algorithmic") extractor
(entity/mod.rs) — the anchor for the P/R ≥ 0.95 triple-parity criterion:

* type dispatch                      — mod.rs:119-144
* persons, 4 phases                  — mod.rs:159-330
  (known names 332-390, title-based 393-440, two-word 443-482, single-word
  307-327)
* organizations (suffix/prefix scan) — mod.rs:485-549
* locations (known list)             — mod.rs:552-583
* concepts/events/objects/generic    — mod.rs:897-1068
* confidence scoring                 — mod.rs:700-738
* mention offsets                    — mod.rs:596-608
* entity id = TYPE_normalized        — mod.rs:594, 758-764
* per-chunk dedupe by (name, type)   — mod.rs:767-788 (first-seen order kept
  for determinism; the reference's HashMap order is arbitrary)
* co-occurrence relationships        — mod.rs:791-817
* predicate inference                — mod.rs:820-858

Everything is a pure function over one chunk's text so it can run inside
Arrow-batched pandas UDFs and inside the single-process oracle identically.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache

PERSON_TITLES = frozenset({
    "mr", "mrs", "ms", "dr", "prof", "professor", "sir", "lady", "lord",
    "captain", "major", "colonel", "general", "admiral", "judge", "father",
    "mother", "brother", "sister", "aunt", "uncle", "grandfather",
    "grandmother",
})

NON_PERSON_WORDS = frozenset({
    "chapter", "the", "and", "but", "or", "in", "on", "at", "to", "for",
    "with", "by", "from", "about", "into", "through", "during", "before",
    "after", "above", "below", "up", "down", "out", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when", "where",
    "why", "how", "all", "any", "both", "each", "few", "more", "most",
    "other", "some", "such", "only", "own", "same", "so", "than", "too",
    "very", "can", "will", "just", "should", "now", "temptations",
    "strategic", "movements", "decides", "upon", "whitewashing", "saturday",
    "monday", "tuesday", "wednesday", "thursday", "friday", "sunday",
    "january", "february", "march", "april", "may", "june", "july", "august",
    "september", "october", "november", "december", "adventures", "complete",
})

KNOWN_NAMES = (
    "Entity Name", "Second Entity", "Guardian Entity", "Friend Entity",
    "Companion Entity", "Third Entity", "Fourth Entity", "Fifth Entity",
    "Sixth Entity", "Seventh Entity", "Eighth Entity", "Ninth Entity",
)

ORG_SUFFIXES = (
    "Inc", "Corp", "LLC", "Ltd", "Company", "Corporation", "Group",
    "Solutions", "Technologies",
)
ORG_PREFIXES = ("University of", "Institute of", "Department of")
ORG_INDICATORS = (
    "Inc", "Corp", "LLC", "Ltd", "Company", "Corporation", "University",
    "Institute",
)

KNOWN_LOCATIONS = (
    "United States", "New York", "California", "London", "Paris", "Tokyo",
    "Berlin", "Washington", "Boston", "Chicago",
)

NAME_ENDINGS = ("son", "sen", "ton", "ham", "ford", "ley", "ment", "ard", "ert")
NAME_PREFIXES = ("mc", "mac", "o'", "de", "van", "von", "la", "le")
SHORT_NON_NAMES = frozenset({
    "it", "is", "as", "at", "be", "by", "do", "go", "he", "if", "in", "me",
    "my", "no", "of", "on", "or", "so", "to", "up", "us", "we",
})

CONCEPT_INDICATORS = (
    "Theory", "Concept", "Principle", "Philosophy", "Doctrine", "Idea",
    "Method", "Approach", "Framework", "Model", "Paradigm", "Thesis",
)
EVENT_WORDS = (
    "meeting", "conference", "ceremony", "celebration", "festival",
    "competition", "war", "battle", "expedition", "journey", "trial",
)
OBJECT_WORDS = (
    "sword", "shield", "book", "manuscript", "scroll", "tablet", "ring",
    "crown", "treasure", "coin", "tool", "weapon",
)

COMMON_WORDS = frozenset(w.lower() for w in (
    "the", "and", "but", "or", "in", "on", "at", "to", "for", "with", "by",
    "from", "about", "into", "through", "during", "before", "after", "above",
    "below", "up", "down", "out", "off", "over", "under", "again", "further",
    "then", "once", "here", "there", "when", "where", "why", "how", "all",
    "any", "both", "each", "few", "more", "most", "other", "some", "such",
    "only", "own", "same", "so", "than", "too", "very", "can", "will",
    "just", "should", "now", "could", "would", "said", "says", "told",
    "asked", "went", "came", "come", "going", "Chapter", "Page", "Section",
    "Part", "Book", "Volume",
))


@dataclass
class ExtractedEntity:
    """One per-chunk entity with its in-chunk mention offsets."""

    entity_id: str
    name: str
    entity_type: str
    confidence: float
    mentions: list[tuple[int, int]] = field(default_factory=list)  # (start, end)


def clean_word(word: str) -> str:
    """mod.rs:622-628 — keep alphabetic + apostrophe, strip trailing '."""
    if word.isalpha():  # fast path: nothing to strip (no apostrophes either)
        return word
    kept = "".join(c for c in word if c.isalpha() or c == "'")
    return kept.rstrip("'")


def is_capitalized(word: str) -> bool:
    """mod.rs:617-619."""
    return bool(word) and word[0].isupper()


def is_likely_person_word(word: str) -> bool:
    """mod.rs:631-668."""
    if len(word) < 2:
        return False
    if not word[0].isupper() or not word.replace("'", "").isalpha():
        return False  # == `is_proper` below (word[0] upper ⇒ ≥1 alpha char)
    wl = word.lower()
    if len(word) <= 2 and wl in SHORT_NON_NAMES:
        return False
    return (
        len(word) >= 3
        or wl.endswith(NAME_ENDINGS)
        or wl.startswith(NAME_PREFIXES)
    )


def is_likely_person_name(name: str) -> bool:
    """mod.rs:677-680 — exactly two capitalized parts."""
    parts = name.split()
    return len(parts) == 2 and all(is_capitalized(p) for p in parts)


def is_likely_organization(name: str) -> bool:
    """mod.rs:683-697."""
    return any(ind in name for ind in ORG_INDICATORS)


def is_known_location(name: str) -> bool:
    """mod.rs:741-755."""
    return any(loc in name for loc in KNOWN_LOCATIONS)


def is_common_word(word: str) -> bool:
    """mod.rs:1071-1086 (case-insensitive)."""
    return word.lower() in COMMON_WORDS


def calculate_confidence(name: str, entity_type: str) -> float:
    """mod.rs:700-738."""
    confidence = 0.5
    if entity_type == "PERSON":
        if "Dr." in name or "Prof." in name:
            confidence += 0.3
        if len(name.split()) == 2:
            confidence += 0.2
    elif entity_type == "ORGANIZATION":
        if "Inc" in name or "Corp" in name or "LLC" in name:
            confidence += 0.3
        if "University" in name or "Institute" in name:
            confidence += 0.2
    elif entity_type == "LOCATION":
        if "," in name:
            confidence += 0.2
        if is_known_location(name):
            confidence += 0.3
    if name[:1].isupper():
        confidence += 0.1
    return min(confidence, 1.0)


def normalize_name(name: str) -> str:
    """mod.rs:758-764 — lowercase, keep [alnum_], then spaces→_ (the space
    filter runs first, so the replace is a no-op; kept for fidelity)."""
    lower = name.lower()
    if lower.isalnum():  # fast path: filter and replace are both no-ops
        return lower
    kept = "".join(c for c in lower if c.isalnum() or c == "_")
    return kept.replace(" ", "_")


@lru_cache(maxsize=1 << 16)
def entity_id_for(name: str, entity_type: str) -> str:
    """mod.rs:594 — `{TYPE}_{normalized}` (pure; cached — the same surface
    forms recur across every chunk a worker processes)."""
    return f"{entity_type}_{normalize_name(name)}"


def find_mentions(text: str, name: str) -> list[tuple[int, int]]:
    """mod.rs:596-608 — every non-overlapping occurrence."""
    mentions = []
    start = 0
    while True:
        pos = text.find(name, start)
        if pos == -1:
            break
        mentions.append((pos, pos + len(name)))
        start = pos + len(name)
    return mentions


def _make_entity(name: str, entity_type: str, confidence: float, text: str) -> ExtractedEntity:
    return ExtractedEntity(
        entity_id=entity_id_for(name, entity_type),
        name=name,
        entity_type=entity_type,
        confidence=confidence,
        mentions=find_mentions(text, name),
    )


# first-word index over KNOWN_NAMES: candidates per bucket keep the
# original tuple order, so the scan below sees names in EXACTLY the order
# the reference's linear loop does (mod.rs:332-390) — pure speedup
_KNOWN_NAMES_BY_FIRST: dict[str, list[tuple[str, list[str]]]] = {}
for _name in KNOWN_NAMES:
    _nw = [w.lower() for w in _name.split()]
    _KNOWN_NAMES_BY_FIRST.setdefault(_nw[0], []).append((_name, _nw))


def _extract_known_names(words, cleaned_lower, processed, text, min_confidence, out):
    """mod.rs:332-390 — PHASE 1. ``cleaned_lower`` is the per-chunk
    precomputed ``clean_word(w).lower()`` list (hot path: this phase was
    75% of extraction time when cleaning per comparison)."""
    n = len(words)
    for i in range(n):
        if i in processed:
            continue
        candidates = _KNOWN_NAMES_BY_FIRST.get(cleaned_lower[i])
        if not candidates:
            continue
        for name, name_words in candidates:
            if i + len(name_words) <= n and all(
                cleaned_lower[i + j] == expected
                for j, expected in enumerate(name_words)
            ):
                if 0.95 >= min_confidence:
                    out.append(_make_entity(name, "PERSON", 0.95, text))
                for j in range(len(name_words)):
                    processed.add(i + j)
                break


def _extract_title_based(words, cleaned, cleaned_lower, processed, text,
                         min_confidence, out):
    """mod.rs:393-440 — PHASE 2."""
    for i in range(len(words)):
        if i in processed:
            continue
        word_clean = cleaned_lower[i]
        if word_clean in PERSON_TITLES and i + 1 < len(words) and (i + 1) not in processed:
            next_word = cleaned[i + 1]
            if is_capitalized(words[i + 1]) and is_likely_person_word(next_word):
                if i + 2 < len(words) and (i + 2) not in processed:
                    third = cleaned[i + 2]
                    if is_capitalized(words[i + 2]) and is_likely_person_word(third):
                        processed.add(i + 2)
                        name = f"{next_word} {third}"
                    else:
                        name = next_word
                else:
                    name = next_word
                if 0.9 >= min_confidence:
                    out.append(_make_entity(name, "PERSON", 0.9, text))
                processed.add(i)
                processed.add(i + 1)


def _extract_two_word(words, cleaned, processed, text, min_confidence, out):
    """mod.rs:443-482 — PHASE 3."""
    for i in range(len(words)):
        if i in processed or i + 1 >= len(words) or (i + 1) in processed:
            continue
        first = cleaned[i]
        second = cleaned[i + 1]
        if (
            is_capitalized(words[i])
            and is_capitalized(words[i + 1])
            and is_likely_person_word(first)
            and is_likely_person_word(second)
            and first.lower() not in NON_PERSON_WORDS
            and second.lower() not in NON_PERSON_WORDS
        ):
            name = f"{first} {second}"
            if is_likely_person_name(name):
                confidence = calculate_confidence(name, "PERSON")
                if confidence >= min_confidence:
                    out.append(_make_entity(name, "PERSON", confidence, text))
                processed.add(i)
                processed.add(i + 1)


def extract_persons(
    text: str,
    min_confidence: float,
    _words: list[str] | None = None,
) -> list[ExtractedEntity]:
    """mod.rs:159-330 — the 4-phase person extractor."""
    entities: list[ExtractedEntity] = []
    words = text.split() if _words is None else _words
    # one cleaning pass per chunk, reused by every phase
    cleaned = [clean_word(w) for w in words]
    cleaned_lower = [c.lower() for c in cleaned]
    processed: set[int] = set()
    _extract_known_names(words, cleaned_lower, processed, text, min_confidence, entities)
    _extract_title_based(words, cleaned, cleaned_lower, processed, text,
                         min_confidence, entities)
    _extract_two_word(words, cleaned, processed, text, min_confidence, entities)
    # PHASE 4: remaining single capitalized words (mod.rs:307-327)
    for i, word_ref in enumerate(words):
        if i in processed:
            continue
        word = cleaned[i]
        if len(word) < 2 or word.lower() in NON_PERSON_WORDS:
            continue
        if is_capitalized(words[i]) and is_likely_person_word(word):
            confidence = calculate_confidence(word, "PERSON")
            if confidence >= min_confidence:
                entities.append(_make_entity(word, "PERSON", confidence, text))
    return entities


def extract_organizations(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """mod.rs:485-549 — NOTE reference quirk: only the FIRST occurrence of
    each suffix/prefix in the chunk is considered (`str::find`)."""
    entities: list[ExtractedEntity] = []
    for suffix in ORG_SUFFIXES:
        pos = text.find(suffix)
        if pos != -1:
            sp = text[:pos].rfind(" ")
            start = sp + 1 if sp != -1 else 0
            end = pos + len(suffix)
            name = text[start:end].strip()
            if name and is_likely_organization(name):
                confidence = calculate_confidence(name, "ORGANIZATION")
                if confidence >= min_confidence:
                    entities.append(_make_entity(name, "ORGANIZATION", confidence, text))
    for prefix in ORG_PREFIXES:
        pos = text.find(prefix)
        if pos != -1:
            dot = text.find(".", pos)
            end = dot if dot != -1 else min(len(text), pos + 50)
            name = text[pos:end].strip()
            if name and len(name) > len(prefix):
                confidence = calculate_confidence(name, "ORGANIZATION")
                if confidence >= min_confidence:
                    entities.append(_make_entity(name, "ORGANIZATION", confidence, text))
    return entities


def extract_locations(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """mod.rs:552-583."""
    entities = []
    for location in KNOWN_LOCATIONS:
        if location in text:
            confidence = calculate_confidence(location, "LOCATION")
            if confidence >= min_confidence:
                entities.append(_make_entity(location, "LOCATION", confidence, text))
    return entities


_CONCEPT_RE = re.compile("|".join(re.escape(i) for i in CONCEPT_INDICATORS))


def extract_concepts(
    text: str,
    entity_type: str,
    min_confidence: float,
    _words: list[str] | None = None,
) -> list[ExtractedEntity]:
    """mod.rs:897-961. ``_words`` is an optional pre-split token list shared
    across extractors by :func:`extract_entities` (pure speedup)."""
    entities = []
    for word in (text.split() if _words is None else _words):
        cw = clean_word(word)
        # `_CONCEPT_RE.search(cw)` ≡ `any(ind in cw for ind in CONCEPT_INDICATORS)`
        if _CONCEPT_RE.search(cw):
            if 0.75 >= min_confidence:
                entities.append(_make_entity(cw, entity_type, 0.75, text))
        if is_capitalized(word) and len(word) > 4:
            if not is_common_word(cw):
                if 0.6 >= min_confidence:
                    entities.append(_make_entity(cw, entity_type, 0.6, text))
    return entities


def extract_events(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """mod.rs:964-998."""
    entities = []
    lower = text.lower()
    for w in EVENT_WORDS:
        if w in lower and 0.7 >= min_confidence:
            entities.append(_make_entity(w, "EVENT", 0.7, text))
    return entities


def extract_objects(text: str, min_confidence: float) -> list[ExtractedEntity]:
    """mod.rs:1001-1036."""
    entities = []
    lower = text.lower()
    for w in OBJECT_WORDS:
        if w in lower and 0.65 >= min_confidence:
            entities.append(_make_entity(w, "OBJECT", 0.65, text))
    return entities


def extract_generic(
    text: str,
    entity_type: str,
    min_confidence: float,
    _words: list[str] | None = None,
) -> list[ExtractedEntity]:
    """mod.rs:1039-1068."""
    entities = []
    for word in (text.split() if _words is None else _words):
        if is_capitalized(word) and len(word) > 3:
            cw = clean_word(word)
            if not is_common_word(cw) and 0.5 >= min_confidence:
                entities.append(_make_entity(cw, entity_type, 0.5, text))
    return entities


_PERSON_TYPES = {"PERSON", "CHARACTER", "RESEARCHER", "SPEAKER", "DIALOGUE_SPEAKER"}
_ORG_TYPES = {"ORGANIZATION", "INSTITUTION", "BRAND", "COMPANY"}
_LOC_TYPES = {"LOCATION", "SETTING", "PLACE"}
_CONCEPT_TYPES = {"CONCEPT", "THEORY", "THEME", "ARGUMENT", "IDEA"}
_EVENT_TYPES = {"EVENT", "EXPERIMENT", "HAPPENING"}
_OBJECT_TYPES = {"OBJECT", "TOOL", "ARTIFACT", "ITEM"}


def extract_entities(
    text: str,
    entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
    min_confidence: float = 0.5,
) -> list[ExtractedEntity]:
    """mod.rs:97-156 — dispatch, dedupe by (name, type), confidence filter.

    Dedupe keeps FIRST-SEEN order (the reference's HashMap iteration order is
    arbitrary; first-seen makes both the Spark pipeline and the oracle
    deterministic and mutually consistent).
    """
    entities: list[ExtractedEntity] = []
    words = text.split()  # split once, shared by every word-scanning extractor
    for et in entity_types:
        if et in _PERSON_TYPES:
            entities.extend(extract_persons(text, min_confidence, _words=words))
        elif et in _ORG_TYPES:
            entities.extend(extract_organizations(text, min_confidence))
        elif et in _LOC_TYPES:
            entities.extend(extract_locations(text, min_confidence))
        elif et in _CONCEPT_TYPES:
            entities.extend(extract_concepts(text, et, min_confidence, _words=words))
        elif et in _EVENT_TYPES:
            entities.extend(extract_events(text, min_confidence))
        elif et in _OBJECT_TYPES:
            entities.extend(extract_objects(text, min_confidence))
        else:
            entities.extend(extract_generic(text, et, min_confidence, _words=words))

    # dedupe by (name, type): merge mentions, keep max confidence (mod.rs:767-788)
    unique: dict[tuple[str, str], ExtractedEntity] = {}
    for e in entities:
        key = (e.name, e.entity_type)
        existing = unique.get(key)
        if existing is not None:
            existing.mentions.extend(e.mentions)
            if e.confidence > existing.confidence:
                existing.confidence = e.confidence
        else:
            unique[key] = e

    return [e for e in unique.values() if e.confidence >= min_confidence]


def infer_relationship_type(type1: str, type2: str, context: str) -> str:
    """mod.rs:820-858 — predicate from the (type, type) pair + keywords."""
    pair = (type1, type2)
    if pair in (("PERSON", "ORGANIZATION"), ("ORGANIZATION", "PERSON")):
        if "works for" in context or "employed by" in context:
            return "WORKS_FOR"
        if "founded" in context or "CEO" in context:
            return "LEADS"
        return "ASSOCIATED_WITH"
    if pair in (("PERSON", "LOCATION"), ("LOCATION", "PERSON")):
        if "born in" in context or "from" in context:
            return "BORN_IN"
        if "lives in" in context or "based in" in context:
            return "LOCATED_IN"
        return "ASSOCIATED_WITH"
    if pair in (("ORGANIZATION", "LOCATION"), ("LOCATION", "ORGANIZATION")):
        if "headquartered" in context or "based in" in context:
            return "HEADQUARTERED_IN"
        return "LOCATED_IN"
    if pair == ("PERSON", "PERSON"):
        if "married" in context or "spouse" in context:
            return "MARRIED_TO"
        if "colleague" in context or "partner" in context:
            return "COLLEAGUE_OF"
        return "KNOWS"
    return "RELATED_TO"


def extract_relationships(
    entities: list[ExtractedEntity], chunk_text: str
) -> list[tuple[str, str, str]]:
    """mod.rs:791-817 — all ordered (i < j) co-occurring pairs; entities with
    no mention in this chunk are skipped (mod.rs:805-807, matching
    lib.rs:513-518's mention filter)."""
    present = [e for e in entities if e.mentions]
    if len(present) < 2:
        return []
    # the predicate depends only on (type1, type2) for a FIXED chunk_text, so
    # resolve it once per type pair — O(T²) keyword scans instead of O(P²)
    types_present = {e.entity_type for e in present}
    pred_of = {
        (a, b): infer_relationship_type(a, b, chunk_text)
        for a in types_present
        for b in types_present
    }
    triples: list[tuple[str, str, str]] = []
    for i in range(len(present) - 1):
        e1 = present[i]
        t1, id1 = e1.entity_type, e1.entity_id
        triples.extend(
            (id1, e2.entity_id, pred_of[t1, e2.entity_type])
            for e2 in present[i + 1 :]
        )
    return triples
