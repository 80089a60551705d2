"""Multilingual detection + processing (graphrag-rs nlp/multilingual.rs).

Trigram language models trained on the reference's exact seed sentences
(rs:196-229), script-range quick heuristics for CJK/Arabic/Cyrillic
(rs:241-284, 322-370), language-aware normalization and tokenization
(rs:407-462). Quirks preserved:

* the n-gram score smooths unseen trigrams with ln(1/(total+1)) and
  averages per-trigram (rs:160-180);
* the "confidence" normalization computes (max−min)/(max−min) — i.e. it
  is 1.0 whenever any two model scores differ and 0.5 when all are equal
  (rs:303-312); faithful, documented;
* Japanese wins over Chinese whenever ANY kana char is present BUT the
  Chinese check runs first: ≥30% CJK-ideograph text is Chinese even with
  kana (rs:242-260);
* alternatives list: top-3 remaining model scores (script-heuristic hits
  hard-code their alternatives, rs:246-283).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

LANGUAGES = ("english", "spanish", "french", "german", "portuguese")

# rs:196-229 — the exact training sentences, trigrams (n=3)
_TRAINING = {
    "english": (
        "the quick brown fox jumps over the lazy dog",
        "this is a test of the english language",
    ),
    "spanish": (
        "el rápido zorro marrón salta sobre el perro perezoso",
        "esta es una prueba del idioma español",
    ),
    "french": (
        "le renard brun rapide saute par-dessus le chien paresseux",
        "ceci est un test de la langue française",
    ),
    "german": (
        "der schnelle braune fuchs springt über den faulen hund",
        "dies ist ein test der deutschen sprache",
    ),
    "portuguese": (
        "a rápida raposa marrom pula sobre o cão preguiçoso",
        "este é um teste da língua portuguesa",
    ),
}


def _build_models() -> dict[str, tuple[dict[str, float], float]]:
    models = {}
    for lang, sentences in _TRAINING.items():
        ngrams: dict[str, float] = {}
        total = 0.0
        for text in sentences:
            chars = list(text)
            for i in range(len(chars) - 2):
                g = "".join(chars[i : i + 3])
                ngrams[g] = ngrams.get(g, 0.0) + 1.0
                total += 1.0
        models[lang] = (ngrams, total)
    return models


_MODELS = _build_models()


def ngram_score(text: str, lang: str) -> float:
    """rs:160-180 LanguageModel::score (n=3, mean log-prob, smoothed)."""
    ngrams, total = _MODELS[lang]
    chars = list(text)
    score = 0.0
    count = 0
    for i in range(len(chars) - 2):
        g = "".join(chars[i : i + 3])
        freq = ngrams.get(g)
        if freq is not None:
            score += math.log(freq / total)
        else:
            score += math.log(1.0 / (total + 1.0))
        count += 1
    return score / count if count else 0.0


def _ratio(text: str, lo: int, hi: int) -> float:
    n = len(text)
    if n == 0:
        return 0.0
    return sum(1 for c in text if lo <= ord(c) <= hi) / n


@dataclass
class DetectionResult:
    language: str
    confidence: float
    alternatives: list[tuple[str, float]] = field(default_factory=list)


def detect_language(text: str) -> DetectionResult:
    """rs:232-319 LanguageDetector::detect."""
    if not text.strip():
        return DetectionResult("unknown", 0.0)

    # script heuristics, in rs order
    if _ratio(text, 0x4E00, 0x9FFF) > 0.3:
        return DetectionResult("chinese", 0.9, [("japanese", 0.1)])
    if any(0x3040 <= ord(c) <= 0x309F or 0x30A0 <= ord(c) <= 0x30FF for c in text):
        return DetectionResult("japanese", 0.9, [("chinese", 0.1)])
    if _ratio(text, 0xAC00, 0xD7AF) > 0.3:
        return DetectionResult("korean", 0.95)
    if _ratio(text, 0x0600, 0x06FF) > 0.3:
        return DetectionResult("arabic", 0.95)
    if _ratio(text, 0x0400, 0x04FF) > 0.3:
        return DetectionResult("russian", 0.9)

    scores = sorted(
        ((lang, ngram_score(text, lang)) for lang in LANGUAGES),
        key=lambda t: -t[1],
    )
    max_s, min_s = scores[0][1], scores[-1][1]
    rng = max_s - min_s
    # rs:303-312 quirk: (max-min)/range ≡ 1.0 whenever range > 0
    confidence = min(max((max_s - min_s) / rng, 0.0), 1.0) if rng > 0 else 0.5
    return DetectionResult(scores[0][0], confidence, scores[1:4])


def normalize_text(text: str, language: str) -> str:
    """rs:408-442: whitespace collapse + language-specific cleanup."""
    normalized = " ".join(text.split())
    if language == "arabic":
        normalized = "".join(
            c for c in normalized if not (0x064B <= ord(c) <= 0x0652)
        )
    elif language in ("chinese", "japanese"):
        normalized = "".join(
            chr(ord(c) - 0xFEE0) if 0xFF01 <= ord(c) <= 0xFF5E else c
            for c in normalized
        )
    return normalized


def tokenize_multilingual(text: str, language: str) -> list[str]:
    """rs:445-462: char-level for CJK, whitespace words otherwise."""
    if language in ("chinese", "japanese"):
        return [c for c in text if not c.isspace()]
    return text.split()


@dataclass
class ProcessedText:
    original: str
    normalized: str
    tokens: list[str]
    language: str
    confidence: float


def process_text(text: str) -> ProcessedText:
    """rs:393-405 MultilingualProcessor::process."""
    d = detect_language(text)
    normalized = normalize_text(text, d.language)
    tokens = tokenize_multilingual(normalized, d.language)
    return ProcessedText(text, normalized, tokens, d.language, d.confidence)
