"""Property-based invariants ported from the reference's top-level
property suite (graphrag-rs tests/property_tests.rs).

Mapping (the reference tests its Mock* trait impls; here the same
invariants run against the real engine surfaces):

* MockEmbedder → functions/embeddings.py hash embedder
  (determinism rs:145-158, dimension consistency rs:160-174, batch ≡
  individual rs:176-192, empty-text handling rs:194-206).
* MockVectorStore → operators/similarity_search.py brute_force_knn
  (search determinism rs:220-258, similarity ordering rs:260-296,
  exact-match self-retrieval rs:298-313, removal consistency rs:316-348
  — removal in a DataFrame engine is an anti-join; the invariant is that
  removed ids never appear in results and result counts shrink
  accordingly).
* MockEntityExtractor → rules/extraction.py
  (confidence ≥ floor rs:352-366, lower-threshold superset rs:368-381,
  empty-text rs:383-391).

The pure-Python invariants run under hypothesis (the proptest
equivalent); the Spark invariants use fixed-seed generated corpora — one
session round-trip per invariant instead of per example, same coverage
of the property.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graphrag_rs_spark.functions.embeddings import embed_series, embed_text

TEXT = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,!?",
    min_size=1,
    max_size=500,
)


# ------------------------------------------------------------------ embedder


@settings(max_examples=50, deadline=None)
@given(TEXT)
def test_embedder_determinism(text):
    # rs:145-158
    e1 = embed_text(text, dim=64)
    e2 = embed_text(text, dim=64)
    assert np.array_equal(e1, e2)


@settings(max_examples=25, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=10))
def test_embedder_dimension_consistency(texts):
    # rs:160-174
    for t in texts:
        assert embed_text(t, dim=64).shape == (64,)


@settings(max_examples=25, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_embedder_batch_consistency(texts):
    # rs:176-192 — the shared-cache batch path must equal one-at-a-time
    batch = embed_series(texts, dim=64)
    for t, b in zip(texts, batch):
        assert np.allclose(embed_text(t, dim=64), np.array(b), atol=0)


@pytest.mark.parametrize("empty", ["", " ", "   ", "\n", "\t"])
def test_embedder_empty_text_handling(empty):
    # rs:194-206 — graceful, correct dimension (ours: zero vector)
    v = embed_text(empty, dim=64)
    assert v.shape == (64,)
    assert np.array_equal(v, np.zeros(64))


# -------------------------------------------------------------- vector store


def _corpus(spark, n=20, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(float)
    return spark.createDataFrame(
        [(f"vec_{i}", [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id string, embedding array<double>",
    ), vecs


def test_vector_store_search_consistency(spark):
    # rs:220-258 — same query twice → identical ids, order, scores
    from graphrag_rs_spark.operators.similarity_search import brute_force_knn

    corpus, vecs = _corpus(spark)
    rng = np.random.default_rng(11)
    queries = spark.createDataFrame(
        [
            (f"q{j}", [float(x) for x in rng.normal(size=16)])
            for j in range(4)
        ],
        "query_id string, embedding array<double>",
    )
    r1 = sorted(
        brute_force_knn(corpus, queries, k=5).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    )
    r2 = sorted(
        brute_force_knn(corpus, queries, k=5).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    )
    assert len(r1) == len(r2) == 4 * 5
    for a, b in zip(r1, r2):
        assert a["vec_id"] == b["vec_id"]
        assert abs(a["cosine"] - b["cosine"]) < 1e-12


def test_vector_store_similarity_ordering(spark):
    # rs:260-296 — a small perturbation of the query must out-rank a
    # large opposite-direction perturbation, across noise levels
    from graphrag_rs_spark.operators.similarity_search import brute_force_knn

    rng = np.random.default_rng(5)
    dim = 16
    rows = []
    queries = []
    for j, noise in enumerate([0.1, 0.3, 0.5, 0.9]):
        base = rng.normal(size=dim)
        similar = base + np.arange(dim) * 0.01 * noise * 0.1
        dissimilar = base - (np.arange(dim) * 0.1 + 1.0) * noise * 2.0
        rows.append((f"similar_{j}", [float(x) for x in similar]))
        rows.append((f"dissimilar_{j}", [float(x) for x in dissimilar]))
        queries.append((f"q{j}", [float(x) for x in base]))
    corpus = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>"
    )
    qdf = spark.createDataFrame(
        queries, "query_id string, embedding array<double>"
    )
    top = {
        r["query_id"]: r["vec_id"]
        for r in brute_force_knn(corpus, qdf, k=2 * len(queries))
        .where("rank = 1")
        .collect()
    }
    for j in range(len(queries)):
        assert top[f"q{j}"] == f"similar_{j}", top


def test_vector_store_exact_match(spark):
    # rs:298-313 — a stored vector queried by itself is rank 1, cosine ≈ 1
    from graphrag_rs_spark.operators.similarity_search import brute_force_knn

    corpus, vecs = _corpus(spark)
    qdf = spark.createDataFrame(
        [("exact", [float(x) for x in vecs[7]])],
        "query_id string, embedding array<double>",
    )
    rows = brute_force_knn(corpus, qdf, k=1).collect()
    assert len(rows) == 1
    assert rows[0]["vec_id"] == "vec_7"
    assert rows[0]["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_vector_store_removal_consistency(spark):
    # rs:316-348 — removal in a DataFrame engine = anti-join; removed ids
    # must vanish from results and the store length must shrink exactly
    from graphrag_rs_spark.operators.similarity_search import brute_force_knn

    corpus, vecs = _corpus(spark)
    removed = {"vec_3", "vec_7", "vec_3", "vec_19"}  # dup on purpose
    remaining = corpus.where(~F_col_isin("vec_id", removed))
    assert remaining.count() == corpus.count() - len(set(removed))
    qdf = spark.createDataFrame(
        [("q", [float(x) for x in vecs[3]])],
        "query_id string, embedding array<double>",
    )
    got = {
        r["vec_id"] for r in brute_force_knn(remaining, qdf, k=20).collect()
    }
    assert got.isdisjoint(removed)
    assert len(got) == 17


def F_col_isin(col, values):
    from pyspark.sql import functions as F

    return F.col(col).isin(*sorted(values))


# ----------------------------------------------------------- extractor gates


def test_extractor_confidence_threshold_and_ordering():
    # rs:352-381 — every emitted entity meets the floor; lowering the
    # floor can only grow the set
    from graphrag_rs_spark.rules.extraction import extract_entities

    text = (
        "Dr. Alice Johnson met Bob Smith at Acme Corporation in New York "
        "on Friday. The Symposium discussed machine learning with IBM and "
        "Stanford University."
    )
    ents = extract_entities(text)
    assert ents, "fixture sentence must extract entities"
    for floor_hi, floor_lo in [(0.9, 0.5), (0.8, 0.1)]:
        hi = [e for e in ents if e.confidence >= floor_hi]
        lo = [e for e in ents if e.confidence >= floor_lo]
        assert all(e.confidence >= floor_hi for e in hi)
        assert len(lo) >= len(hi)
        assert {(e.name, e.entity_type) for e in hi} <= {
            (e.name, e.entity_type) for e in lo
        }


@pytest.mark.parametrize("empty", ["", " ", "  \n\t "])
def test_extractor_empty_text(empty):
    # rs:383-391
    from graphrag_rs_spark.rules.extraction import extract_entities

    assert len(extract_entities(empty)) <= 1
