"""LazyGraphRAG query refinement (lightrag/query_refinement.rs port)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.lazy_retrieval import (
    denormalize_entity_id_col,
    normalize_concept_col,
    refine_queries,
)


def test_normalize_concept_quirk(spark):
    # rs:307-314: the alphanumeric filter runs BEFORE the space replace,
    # so spaces vanish instead of becoming underscores
    df = spark.createDataFrame(
        [("Machine Learning",), ("deep_learning",)], "c string"
    )
    rows = [
        r["n"]
        for r in df.select(normalize_concept_col(F.col("c")).alias("n"))
        .collect()
    ]
    assert rows == ["machinelearning", "deep_learning"]


def test_denormalize_entity_id(spark):
    # rs:317-325: drop leading all-uppercase parts
    df = spark.createDataFrame(
        [("PERSON_maria_garcia",), ("machinelearning",), ("ORG_TYPE_acme",)],
        "e string",
    )
    rows = [
        r["d"]
        for r in df.select(denormalize_entity_id_col(F.col("e")).alias("d"))
        .collect()
    ]
    assert rows == ["maria_garcia", "machinelearning", "acme"]


@pytest.fixture(scope="module")
def concept_world(spark):
    # concept graph: "Machine Learning" co-occurs with "Neural Networks"
    # (conf .9) and "Data Mining" (conf .5); "Neural Networks" also with
    # "Deep Learning" (conf .8)
    concepts = spark.createDataFrame(
        [
            ("Machine Learning", 10),
            ("Neural Networks", 8),
            ("Data Mining", 3),
            ("Deep Learning", 6),
        ],
        "concept string, frequency long",
    )
    relations = spark.createDataFrame(
        [
            ("Machine Learning", "Neural Networks", 0.9),
            ("Neural Networks", "Machine Learning", 0.9),
            ("Machine Learning", "Data Mining", 0.5),
            ("Data Mining", "Machine Learning", 0.5),
            ("Neural Networks", "Deep Learning", 0.8),
            ("Deep Learning", "Neural Networks", 0.8),
        ],
        "source string, target string, confidence double",
    )
    mentions = spark.createDataFrame(
        [
            ("machinelearning", "c1"),
            ("neuralnetworks", "c1"),
            ("neuralnetworks", "c2"),
            ("datamining", "c3"),
            ("deeplearning", "c2"),
        ],
        "concept_norm string, chunk_id string",
    )
    return concepts, relations, mentions


def test_refine_queries_expansion_and_chunks(spark, concept_world):
    concepts, relations, mentions = concept_world
    queries = spark.createDataFrame(
        [("Tell me about Machine Learning",)], "query string"
    )
    expanded, chunks = refine_queries(
        queries, concepts, relations, mentions, max_iterations=2,
        use_relevance_feedback=False,
    )
    rows = expanded.collect()
    by_concept = {r["concept"]: r for r in rows}

    # initial concept at score 1.0 (rs:130-133)
    assert by_concept["Machine Learning"]["is_initial"]
    assert by_concept["Machine Learning"]["score"] == pytest.approx(1.0)

    # iteration 1 expands to Neural Networks and Data Mining with the
    # connectivity score (ln(freq)+1)·(1+0.5·connections):
    # NN: (ln 8 + 1)·(1 + .5·1) = 4.619; DM: (ln 3 + 1)·1.5 = 3.148
    nn = by_concept["Neural Networks"]
    assert not nn["is_initial"]
    assert nn["iteration"] == 1
    assert nn["score"] == pytest.approx((math.log(8) + 1) * 1.5, rel=1e-6)
    dm = by_concept["Data Mining"]
    assert dm["score"] == pytest.approx((math.log(3) + 1) * 1.5, rel=1e-6)

    # iteration 2 reaches Deep Learning through Neural Networks; it
    # connects to NN only → (ln 6 + 1)·1.5
    dl = by_concept["Deep Learning"]
    assert dl["iteration"] == 2
    assert dl["score"] == pytest.approx((math.log(6) + 1) * 1.5, rel=1e-6)

    # chunks: expansions' normalized forms hit the mention index —
    # NN → {c1, c2}, DM → {c3}, DL → {c2} (initial concepts retrieve
    # nothing themselves, rs:176-180 uses NEW concepts only)
    got = {r["chunk_id"] for r in chunks.collect()}
    assert got == {"c1", "c2", "c3"}


def test_refine_queries_cap(spark, concept_world):
    concepts, relations, mentions = concept_world
    queries = spark.createDataFrame(
        [("Tell me about Machine Learning",)], "query string"
    )
    expanded, _ = refine_queries(
        queries, concepts, relations, mentions, max_iterations=3,
        max_total_concepts=3, use_relevance_feedback=False,
    )
    rows = expanded.collect()
    # 2 initial concepts (the capitalized-phrase pattern also matches the
    # whole query "Tell me about Machine Learning") + cap leaves room for
    # exactly 1 expansion; the higher-scored Neural Networks wins the
    # deterministic cap ranking
    assert len(rows) == 3
    expansions = [r for r in rows if not r["is_initial"]]
    assert [r["concept"] for r in expansions] == ["Neural Networks"]


def test_refine_queries_no_concepts(spark, concept_world):
    concepts, relations, mentions = concept_world
    queries = spark.createDataFrame(
        [("lowercase gibberish only",)], "query string"
    )
    expanded, chunks = refine_queries(
        queries, concepts, relations, mentions, max_iterations=2
    )
    assert expanded.count() == 0
    assert chunks.count() == 0


def test_relevance_feedback_boost(spark, concept_world):
    # feedback only fires when a denormalized entity id string equals the
    # concept text — use a single-word lowercase concept to trigger it
    concepts = spark.createDataFrame(
        [("Machine Learning", 10), ("backprop", 4)],
        "concept string, frequency long",
    )
    relations = spark.createDataFrame(
        [
            ("Machine Learning", "backprop", 0.9),
            ("backprop", "Machine Learning", 0.9),
        ],
        "source string, target string, confidence double",
    )
    mentions = spark.createDataFrame(
        [("backprop", "c1"), ("backprop", "c2")],
        "concept_norm string, chunk_id string",
    )
    queries = spark.createDataFrame(
        [("Tell me about Machine Learning",)], "query string"
    )
    expanded, chunks = refine_queries(
        queries, concepts, relations, mentions, max_iterations=2,
        use_relevance_feedback=True,
    )
    rows = {r["concept"]: r for r in expanded.collect()}
    # backprop expands at (ln4+1)·1.5, then feedback multiplies by
    # (1 + ln 2) — it appears in both retrieved chunks
    base = (math.log(4) + 1) * 1.5
    assert rows["backprop"]["score"] == pytest.approx(
        base * (1 + math.log(2)), rel=1e-6
    )
    assert {r["chunk_id"] for r in chunks.collect()} == {"c1", "c2"}


def test_iterative_deepening_full_trace(spark, concept_world):
    from graphrag_rs_spark.operators.lazy_retrieval import (
        iterative_deepening_search,
    )

    concepts, relations, mentions = concept_world
    queries = spark.createDataFrame(
        [("Tell me about Machine Learning",)], "query string"
    )
    chunks, summary = iterative_deepening_search(
        queries, concepts, relations, mentions, max_depth=3,
        use_adaptive_depth=False,
    )
    # hand trace: depth 0 visits c1 (machinelearning); expansion adds
    # NN + DM; depth 1 visits c2 (NN) and c3 (DM); expansion adds DL;
    # depth 2 finds nothing new and no new nominees → NoMoreConcepts
    got = {(r["chunk_id"], r["depth_found"]) for r in chunks.collect()}
    assert got == {("c1", 0), ("c2", 1), ("c3", 1)}

    s = summary.collect()[0]
    assert s["depth_reached"] == 2
    assert s["total_chunks"] == 3
    # ML + "Tell me about Machine Learning" + NN + DM + DL
    assert s["total_concepts_explored"] == 5
    assert s["stop_reason"] == "NoMoreConcepts"


def test_iterative_deepening_max_depth_zero(spark, concept_world):
    # degenerate max_depth=0: loop never runs — must return an empty
    # chunks frame and a MaxDepthReached summary, not crash on a None
    # visited frame
    from graphrag_rs_spark.operators.lazy_retrieval import (
        iterative_deepening_search,
    )

    concepts, relations, mentions = concept_world
    queries = spark.createDataFrame(
        [("Tell me about Machine Learning",)], "query string"
    )
    chunks, summary = iterative_deepening_search(
        queries, concepts, relations, mentions, max_depth=0,
    )
    assert chunks.count() == 0
    s = summary.collect()[0]
    assert s["total_chunks"] == 0
    assert s["depth_reached"] == 0
    assert s["stop_reason"] == "MaxDepthReached"


def test_iterative_deepening_max_chunks_stop(spark, concept_world):
    from graphrag_rs_spark.operators.lazy_retrieval import (
        iterative_deepening_search,
    )

    concepts, relations, mentions = concept_world
    queries = spark.createDataFrame(
        [("Tell me about Machine Learning",)], "query string"
    )
    _, summary = iterative_deepening_search(
        queries, concepts, relations, mentions, max_depth=3, max_chunks=1,
    )
    s = summary.collect()[0]
    assert s["stop_reason"] == "MaxChunksReached"
    assert s["depth_reached"] == 0
    assert s["total_chunks"] == 1


def test_iterative_deepening_quality_stop(spark, concept_world):
    from graphrag_rs_spark.operators.lazy_retrieval import (
        iterative_deepening_search,
    )

    concepts, relations, mentions = concept_world
    queries = spark.createDataFrame(
        [("Tell me about Machine Learning",)], "query string"
    )
    _, summary = iterative_deepening_search(
        queries, concepts, relations, mentions, max_depth=3, min_chunks=1,
        use_adaptive_depth=True, adaptive_quality_threshold=0.1,
    )
    s = summary.collect()[0]
    # depth 1: 3 chunks / 4 concepts = 0.75 ≥ 0.1 and depth > 0
    assert s["stop_reason"] == "QualityThresholdMet"
    assert s["depth_reached"] == 1
