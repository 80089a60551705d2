"""Pure-Python port of the reference's LazyGraphRAG concept extractor
(graphrag-rs lightrag/concept_graph.rs:118-260).

Deterministic, no-LLM concept mining: two regex families (capitalized
named-entity phrases and general noun phrases), a stopword-majority
validity filter, and a top-20 term-frequency keyword pass (freq >= 2).
These rules run identically inside the Spark pandas UDF, in the test
oracle, and (for the regex/keyword parts) as JVM `regexp_extract_all`
expressions — the unit tests pin the three implementations together.
"""

from __future__ import annotations

import re

# concept_graph.rs:144-151 — the two patterns
NOUN_PHRASE_PATTERN = re.compile(r"\b[A-Z][a-z]+(?:\s+[A-Z]?[a-z]+){1,4}\b")
CAPITALIZED_PATTERN = re.compile(r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+\b")

# concept_graph.rs:246-260 — default English stopword set
CONCEPT_STOPWORDS = frozenset(
    """the a an and or but in on at to for of with by from as is was are were be
    been being have has had do does did will would should could may might must
    can this that these those it its i you he she we they them their what which
    who when where why how all each every both few more most other some such no
    nor not only own same so than too very just now""".split()
)

DEFAULT_MIN_LENGTH = 3  # ConceptExtractorConfig defaults (concept_graph.rs:289-297)
DEFAULT_MAX_WORDS = 5


def is_valid_concept(
    phrase: str,
    min_length: int = DEFAULT_MIN_LENGTH,
    max_words: int = DEFAULT_MAX_WORDS,
) -> bool:
    """concept_graph.rs:196-221: length floor, word-count cap, and reject
    phrases that are majority stopwords."""
    if len(phrase) < min_length:
        return False
    words = phrase.split()
    if len(words) > max_words:
        return False
    stop = sum(1 for w in words if w.lower() in CONCEPT_STOPWORDS)
    return not stop > len(words) // 2


def extract_keywords(
    text: str, min_length: int = DEFAULT_MIN_LENGTH, top_k: int = 20
) -> list[str]:
    """concept_graph.rs:223-244: whitespace words, lowercase, strip
    non-alphanumeric edge chars, length >= min_length, non-stopword; top-20
    by frequency with freq >= 2.

    The reference's HashMap iteration makes its tie order unspecified; we
    tie-break (count desc, word asc) so results are stable across engines.
    """
    freq: dict[str, int] = {}
    for word in text.split():
        # equivalent of trim_matches(|c| !c.is_alphanumeric())
        norm = re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", word.lower())
        if len(norm) >= min_length and norm not in CONCEPT_STOPWORDS:
            freq[norm] = freq.get(norm, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    return [w for w, c in ranked[:top_k] if c >= 2]


def extract_concepts(
    text: str,
    min_length: int = DEFAULT_MIN_LENGTH,
    max_words: int = DEFAULT_MAX_WORDS,
) -> list[str]:
    """concept_graph.rs:160-194: capitalized phrases + noun phrases (both
    validity-filtered) + TF keywords, deduplicated and sorted."""
    concepts: list[str] = []
    for pat in (CAPITALIZED_PATTERN, NOUN_PHRASE_PATTERN):
        for m in pat.finditer(text):
            phrase = m.group(0)
            if is_valid_concept(phrase, min_length, max_words):
                concepts.append(phrase)
    concepts.extend(extract_keywords(text, min_length))
    return sorted(set(concepts))
