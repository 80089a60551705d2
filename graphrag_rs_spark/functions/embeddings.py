"""Deterministic hash embeddings — the reference's ``EmbeddingGenerator``
(graphrag-rs vector/mod.rs:559-685): per-word hash-derived vectors in
[-1, 1], averaged over the text's words, L2-normalized.

The reference hashes with Rust's ``DefaultHasher`` (SipHash, unstable
across Rust releases by contract), so bit-level parity is neither possible
nor meaningful; we keep the construction (word → dim pseudo-random values
→ ``(h % 2000 − 1000)/1000`` → unit-normalize; text → word-average →
unit-normalize) with SHAKE-128 as the stable word hash. Semantics that DO
carry over and are tested: determinism, unit norm, equal-texts ⇒ equal
vectors, word-order invariance of the average, similar-word-bag texts ⇒
high cosine.

``hash_embed_pudf`` is the vectorized Arrow path (one numpy pass per
batch, per-unique-word caching), used by the pipeline's embedding stage
and the semantic chunker.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def word_vector(word: str, dim: int) -> np.ndarray:
    """Stable per-word vector (vector/mod.rs:625-645 construction):
    ``dim`` values in [-1, 1] from one SHAKE-128 stream, unit-normalized."""
    raw = hashlib.shake_128(word.encode("utf-8")).digest(dim * 4)
    ints = np.frombuffer(raw, dtype="<u4").astype(np.float64)
    vec = ((ints % 2000) - 1000.0) / 1000.0
    norm = float(np.linalg.norm(vec))
    return vec / norm if norm > 0 else vec


def embed_text(
    text: str, dim: int = 64, cache: dict[str, np.ndarray] | None = None
) -> np.ndarray:
    """Word-average hash embedding (vector/mod.rs:587-623): lowercase
    whitespace words, per-word vectors averaged, unit-normalized; empty
    text → zero vector."""
    words = text.split()
    if not words:
        return np.zeros(dim)
    if cache is None:
        cache = {}
    acc = np.zeros(dim)
    for w in words:
        wl = w.lower()
        v = cache.get(wl)
        if v is None:
            v = word_vector(wl, dim)
            cache[wl] = v
        acc += v
    acc /= len(words)
    norm = float(np.linalg.norm(acc))
    return acc / norm if norm > 0 else acc


def embed_series(texts, dim: int = 64) -> list[list[float]]:
    """Batch helper for pandas UDFs: shared word cache across the batch."""
    cache: dict[str, np.ndarray] = {}
    return [
        [float(x) for x in embed_text(t or "", dim, cache)] for t in texts
    ]


def add_embeddings(df, text_col: str = "text", dim: int = 64,
                   out_col: str = "embedding"):
    """Append an ``array<float>`` hash-embedding column via a vectorized
    pandas UDF (Arrow-batched; the shared word cache amortizes hashing
    across each batch)."""
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("array<float>")
    def hash_embed(texts: pd.Series) -> pd.Series:
        return pd.Series(embed_series(texts, dim))

    return df.withColumn(out_col, hash_embed(col(text_col)))
