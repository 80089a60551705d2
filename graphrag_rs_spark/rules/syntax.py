"""Rule-based syntax analysis (graphrag-rs nlp/syntax_analyzer.rs).

Deterministic POS tagging, simplified dependency parsing, noun-phrase
extraction and sentence segmentation — no ML models, pure pattern
matching, exactly the reference's rules including its quirks:

* dictionary lookups run BEFORE the capitalization test (rs:258-287), so
  "The" is a Determiner while any capitalized out-of-dictionary word —
  including a sentence-initial one — is a ProperNoun;
* words in both the determiner and pronoun dictionaries ("this", "that",
  "what", "which") tag as Determiner because that dictionary is probed
  first (rs:259-264);
* the lemmatizer strips suffixes blindly: ``running → runn``
  (rs:342-348, pinned by the reference's own test rs:605);
* the dependency parser roots at the FIRST Verb/VerbPast/Verb3rdSing
  (gerunds can't root), adverbs attach to the FIRST verb in the sentence
  (not the nearest), and subject/object/adjective/determiner searches
  match singular Noun/ProperNoun only (rs:354-438);
* noun phrases accumulate Determiner/Adjective/any-noun runs and break on
  everything else; ``head_idx`` is the index of the LAST noun within the
  phrase (rs:442-496).

Pure Python, executor-safe: used by operators/nlp.py Arrow batches and
directly by the ported unit vectors in tests/test_syntax_nlp.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# rs:509-577 dictionary builders (verbatim word lists)
_NOUNS = {
    "time", "person", "year", "way", "day", "thing", "man", "world", "life",
    "hand", "part", "child", "eye", "woman", "place", "work", "week", "case",
    "point", "government", "company", "number", "group", "problem", "fact",
}
_VERBS = {
    "be", "have", "do", "say", "get", "make", "go", "know", "take", "see",
    "come", "think", "look", "want", "give", "use", "find", "tell", "ask",
    "work", "seem", "feel", "try", "leave", "call",
}
_ADJECTIVES = {
    "good", "new", "first", "last", "long", "great", "little", "own", "other",
    "old", "right", "big", "high", "different", "small", "large", "next",
    "early", "young", "important", "few", "public", "bad", "same", "able",
}
_ADVERBS = {
    "not", "so", "out", "up", "now", "only", "just", "more", "also", "very",
    "well", "back", "there", "even", "still", "too", "here", "then", "always",
    "never", "often", "quite", "really", "almost", "again",
}
_PREPOSITIONS = {
    "of", "in", "to", "for", "with", "on", "at", "from", "by", "about",
    "into", "through", "during", "before", "after", "above", "below",
    "between", "under", "since", "without", "within", "along", "among",
    "across",
}
_DETERMINERS = {
    "the", "a", "an", "this", "that", "these", "those", "my", "your",
    "his", "her", "its", "our", "their", "all", "both", "each", "every",
    "some", "any", "no", "another", "such", "what", "which",
}
_PRONOUNS = {
    "i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
    "us", "them", "who", "whom", "what", "which", "this", "that",
}
_CONJUNCTIONS = {
    "and", "or", "but", "nor", "yet", "so", "for", "because", "although",
    "though", "while", "if", "unless", "until", "when", "where",
}

# NOTE: "so"/"for" live in both adverb/preposition and conjunction dicts;
# probe order (rs:258-282) resolves them: determiners → pronouns →
# prepositions → conjunctions → adverbs → verbs → adjectives → nouns.

_ASCII_PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")

VERB_TAGS = ("VB", "VBD", "VBZ")  # root-eligible (gerunds excluded)
NOUN_SG_TAGS = ("NN", "NNP")  # subject/object/modifier targets
NOUN_ALL_TAGS = ("NN", "NNP", "NNS", "NNPS")


@dataclass
class Token:
    text: str
    position: int  # char offset (rs tokenize enumerates chars)
    pos: str  # Penn tag string (rs POSTag::penn_tag)
    lemma: str


def tokenize(text: str) -> list[tuple[str, int]]:
    """rs:194-222: alnum/'/- words; punctuation as single-char tokens."""
    tokens: list[tuple[str, int]] = []
    current = ""
    start = 0
    for i, ch in enumerate(text):
        if ch.isalnum() or ch in ("'", "-"):
            if not current:
                start = i
            current += ch
        else:
            if current:
                tokens.append((current, start))
                current = ""
            if not ch.isspace():
                tokens.append((ch, i))
    if current:
        tokens.append((current, start))
    return tokens


def tag_word(word: str) -> str:
    """rs:245-315 tag_word → Penn tag string."""
    lower = word.lower()
    if all(c in _ASCII_PUNCT for c in word):
        return "."
    if all(c.isdigit() and c.isascii() for c in word):
        return "CD"
    if lower in _DETERMINERS:
        return "DT"
    if lower in _PRONOUNS:
        return "PRP"
    if lower in _PREPOSITIONS:
        return "IN"
    if lower in _CONJUNCTIONS:
        return "CC"
    if lower in _ADVERBS:
        return "RB"
    if lower in _VERBS:
        return "VB"
    if lower in _ADJECTIVES:
        return "JJ"
    if lower in _NOUNS:
        return "NN"
    if word and word[0].isupper():
        return "NNP"
    if lower.endswith("ing"):
        return "VBG"
    if lower.endswith("ed"):
        return "VBD"
    if lower.endswith("s") and not lower.endswith("ss"):
        return "NNS"
    if lower.endswith(("ive", "ous", "ful")):
        return "JJ"
    if lower.endswith("ly"):
        return "RB"
    return "NN"


def lemmatize(word: str, pos: str) -> str:
    """rs:318-351 — blind suffix stripping, quirks preserved
    ("running" → "runn", rs test :605)."""
    lower = word.lower()
    if pos == "NNS":
        if lower.endswith("ies"):
            return lower[:-3] + "y"
        if lower.endswith("s") and not lower.endswith("ss"):
            return lower[:-1]
        return lower
    if pos in ("VBD", "VBZ"):
        if lower.endswith("ed"):
            return lower[:-2]
        if lower.endswith("s"):
            return lower[:-1]
        return lower
    if pos == "VBG":
        if lower.endswith("ing"):
            return lower[:-3]
        return lower
    return lower


def pos_tag(text: str) -> list[Token]:
    """rs:225-242."""
    return [
        Token(text=w, position=p, pos=(t := tag_word(w)), lemma=lemmatize(w, t))
        for w, p in tokenize(text)
    ]


@dataclass
class Dependency:
    head: int
    dependent: int
    relation: str


def parse_dependencies(tokens: list[Token]) -> list[Dependency]:
    """rs:354-439 simplified dependency parse (quirks preserved: first
    verb roots; adverbs attach to the FIRST verb; singular nouns only)."""
    deps: list[Dependency] = []
    if not tokens:
        return deps
    root_idx = next(
        (i for i, t in enumerate(tokens) if t.pos in VERB_TAGS), 0
    )
    for i in range(root_idx):
        if tokens[i].pos in ("NN", "NNP", "PRP"):
            deps.append(Dependency(root_idx, i, "Subject"))
            break
    for i in range(root_idx + 1, len(tokens)):
        if tokens[i].pos in NOUN_SG_TAGS:
            deps.append(Dependency(root_idx, i, "DirectObject"))
            break
    first_verb = next(
        (i for i, t in enumerate(tokens) if t.pos in VERB_TAGS), None
    )
    for i, tok in enumerate(tokens):
        if tok.pos == "JJ":
            nxt = next(
                (
                    j
                    for j in range(i + 1, len(tokens))
                    if tokens[j].pos in NOUN_SG_TAGS
                ),
                None,
            )
            if nxt is not None:
                deps.append(Dependency(nxt, i, "Modifier"))
        elif tok.pos == "RB":
            if first_verb is not None:
                deps.append(Dependency(first_verb, i, "Modifier"))
        elif tok.pos == "DT":
            nxt = next(
                (
                    j
                    for j in range(i + 1, len(tokens))
                    if tokens[j].pos in NOUN_SG_TAGS
                ),
                None,
            )
            if nxt is not None:
                deps.append(Dependency(nxt, i, "Determiner"))
    return deps


@dataclass
class NounPhrase:
    text: str
    head_idx: int
    start: int  # char offset of first token
    tags: list[str]


def extract_noun_phrases(tokens: list[Token]) -> list[NounPhrase]:
    """rs:442-496."""
    phrases: list[NounPhrase] = []
    current: list[Token] = []
    head_idx = 0

    def flush():
        nonlocal current, head_idx
        if current:
            phrases.append(
                NounPhrase(
                    text=" ".join(t.text for t in current),
                    head_idx=head_idx,
                    start=current[0].position,
                    tags=[t.pos for t in current],
                )
            )
            current = []
            head_idx = 0

    for token in tokens:
        if token.pos in ("DT", "JJ"):
            current.append(token)
        elif token.pos in NOUN_ALL_TAGS:
            head_idx = len(current)
            current.append(token)
        else:
            flush()
    flush()
    return phrases


_SENTENCE_RE = re.compile(r"[.!?]+\s+")


def segment_sentences(text: str) -> list[str]:
    """rs:499-506: split on terminal-punct + whitespace runs."""
    return [s.strip() for s in _SENTENCE_RE.split(text) if s.strip()]
