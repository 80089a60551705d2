"""Pure-Python port of the reference's semantic chunker
(graphrag-rs text/semantic_chunking.rs).

Pipeline per document (semantic_chunking.rs:93-123): sentence split →
hash embeddings → consecutive-sentence cosine distances (1 − sim, with a
``buffer_size`` offset) → breakpoints by Percentile / StandardDeviation /
Absolute strategy → chunks between breakpoints with min/max sentence
bounds. The reference's ``create_chunks`` merges a below-min run into the
FOLLOWING chunk (it skips the start_idx advance, rs:275-281) — ported
as-is.

Embeddings come from functions/embeddings.py (the stable-hash twin of the
reference's EmbeddingGenerator), so the whole chunker is deterministic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from graphrag_rs_spark.functions.embeddings import embed_text

STRATEGIES = ("percentile", "std_dev", "absolute")


@dataclass(frozen=True)
class SemanticChunkerConfig:
    """semantic_chunking.rs:44-77 defaults."""

    strategy: str = "percentile"
    threshold_amount: float = 95.0  # percentile 0-100 | n·σ | abs distance
    min_chunk_size: int = 1  # sentences
    max_chunk_size: int = 0  # 0 = unlimited
    buffer_size: int = 1
    embedding_dim: int = 64


def split_sentences(text: str) -> list[str]:
    """semantic_chunking.rs:125-163: line-wise scan, split_inclusive on
    .!?, blank line flushes, trailing partial kept."""
    sentences: list[str] = []
    current = ""
    for line in text.splitlines():
        line = line.strip()
        if not line:
            if current:
                sentences.append(current.strip())
                current = ""
            continue
        # split_inclusive on sentence enders
        parts: list[str] = []
        buf = ""
        for ch in line:
            buf += ch
            if ch in ".!?":
                parts.append(buf)
                buf = ""
        if buf:
            parts.append(buf)
        for part in parts:
            part = part.strip()
            if not part:
                continue
            current += part + " "
            if part.endswith((".", "!", "?")):
                sentences.append(current.strip())
                current = ""
    if current.strip():
        sentences.append(current.strip())
    return sentences


def _cosine(a, b) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


def similarity_differences(embeddings, buffer_size: int = 1) -> list[float]:
    """rs:178-196: distance = 1 − cos(e[i], e[i+buffer])."""
    n = len(embeddings)
    return [
        1.0 - _cosine(embeddings[i], embeddings[i + buffer_size])
        for i in range(max(n - buffer_size, 0))
    ]


def breakpoint_threshold(diffs: list[float], cfg: SemanticChunkerConfig) -> float:
    if cfg.strategy == "percentile":
        # rs:236-246: index = floor(len * p/100), clamped
        s = sorted(diffs)
        idx = min(int(len(s) * cfg.threshold_amount / 100.0), len(s) - 1)
        return s[idx]
    if cfg.strategy == "std_dev":
        # rs:249-259: mean + n·σ (population σ)
        mean = sum(diffs) / len(diffs)
        var = sum((x - mean) ** 2 for x in diffs) / len(diffs)
        return mean + cfg.threshold_amount * math.sqrt(var)
    if cfg.strategy == "absolute":
        return cfg.threshold_amount
    raise ValueError(f"unknown strategy {cfg.strategy!r}")


def determine_breakpoints(diffs: list[float], cfg: SemanticChunkerConfig) -> list[int]:
    """rs:211-233: strictly-greater comparison; breakpoint index is the
    FOLLOWING sentence index."""
    if not diffs:
        return []
    thr = breakpoint_threshold(diffs, cfg)
    return [i + 1 for i, d in enumerate(diffs) if d > thr]


def create_chunks(
    sentences: list[str], breakpoints: list[int], cfg: SemanticChunkerConfig
) -> list[dict]:
    """rs:260-310, including the merge-forward behavior for below-min runs
    and the max-size resplit."""
    chunks: list[dict] = []
    start = 0
    for end in [*breakpoints, len(sentences)]:
        if end <= start:
            continue
        count = end - start
        if count < cfg.min_chunk_size:
            continue  # start NOT advanced: run merges into the next chunk
        if cfg.max_chunk_size > 0 and count > cfg.max_chunk_size:
            sub = start
            while sub < end:
                sub_end = min(sub + cfg.max_chunk_size, end)
                chunks.append(
                    {
                        "content": " ".join(sentences[sub:sub_end]),
                        "start_sentence": sub,
                        "end_sentence": sub_end,
                        "sentence_count": sub_end - sub,
                    }
                )
                sub = sub_end
        else:
            chunks.append(
                {
                    "content": " ".join(sentences[start:end]),
                    "start_sentence": start,
                    "end_sentence": end,
                    "sentence_count": count,
                }
            )
        start = end
    return chunks


def semantic_chunk(text: str, cfg: SemanticChunkerConfig | None = None) -> list[dict]:
    """Full chunker (rs:93-123). Single-sentence fast path returns the raw
    text as one chunk, as the reference does."""
    cfg = cfg or SemanticChunkerConfig()
    sentences = split_sentences(text)
    if not sentences:
        return []
    if len(sentences) == 1:
        return [
            {
                "content": text,
                "start_sentence": 0,
                "end_sentence": 1,
                "sentence_count": 1,
            }
        ]
    cache: dict = {}
    embeddings = [embed_text(s, cfg.embedding_dim, cache) for s in sentences]
    diffs = similarity_differences(embeddings, cfg.buffer_size)
    bps = determine_breakpoints(diffs, cfg)
    return create_chunks(sentences, bps, cfg)
