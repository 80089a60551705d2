"""Query-side retrieval operators: BM25, RRF, PageRank, keywords, temporal
snapshots, semantic similarity edges."""

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.retrieval import (
    bm25_scores,
    bm25_tokenize,
    keywords_tf,
    pagerank,
    rrf_fuse,
    semantic_similarity_edges,
    snapshot_at,
    snapshot_range,
)


def _bm25_expected(docs, query, k1=1.2, b=0.75):
    """Independent reimplementation of bm25.rs:117-192 for cross-checking."""
    toks = {d: bm25_tokenize(t) for d, t in docs}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    scores = {}
    for term in dict.fromkeys(bm25_tokenize(query)):
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(n / df) + 1.0
        for d, t in toks.items():
            cnt = t.count(term)
            if not cnt:
                continue
            tf = cnt / dl[d]
            scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dl[d] / avgdl)
            )
    return scores


DOCS = [
    (1, "Spark shuffle join partition"),
    (2, "spark spark streaming watermark"),
    (3, "python pandas numpy arrow"),
    (4, "the and is of to in"),  # all stopwords/short → empty token list
]


def test_bm25_matches_reference_formula(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, "spark join").collect()}
    expected = _bm25_expected(DOCS, "spark join")
    assert set(got) == set(expected)
    for d, s in expected.items():
        assert got[d] == pytest.approx(s, rel=1e-12)
    # doc 2 has higher tf for 'spark' → must outrank doc 1 on 'spark' alone
    solo = {r["doc_id"]: r["score"] for r in bm25_scores(df, "spark").collect()}
    assert solo[2] > solo[1]


def test_bm25_empty_corpus_keeps_id_type(spark):
    # the empty-corpus early return must carry the INPUT's id type — a
    # hardcoded long diverged from the string-id schema of non-empty
    # calls, breaking downstream unions on the edge case
    df = spark.createDataFrame([], "doc_id string, text string")
    out = bm25_scores(df, "anything")
    assert out.count() == 0
    assert dict(out.dtypes)["doc_id"] == "string"
    full = spark.createDataFrame(
        [("d1", "spark join")], "doc_id string, text string"
    )
    # schema-compatible with a non-empty call's result
    assert bm25_scores(full, "spark").unionByName(out).count() == 1


def test_bm25_tokenizer_rules():
    assert bm25_tokenize("The QUICK-brown fox!! 42x") == ["quickbrown", "fox", "42x"]
    assert bm25_tokenize("a an it we") == []  # stopwords
    assert bm25_tokenize("ab xy") == []  # len <= 2


def test_rrf_formula(spark):
    rows = [("l1", "a", 1), ("l1", "b", 2), ("l2", "b", 1), ("l2", "c", 2)]
    df = spark.createDataFrame(rows, "list_id string, item_id string, rank int")
    got = {r["item_id"]: (r["rrf_score"], r["n_lists"]) for r in rrf_fuse(df, k=60).collect()}
    assert got["a"] == (pytest.approx(1 / 61), 1)
    assert got["b"] == (pytest.approx(1 / 62 + 1 / 61), 2)
    assert got["c"] == (pytest.approx(1 / 62), 1)
    assert got["b"][0] > got["a"][0] > got["c"][0]


def test_pagerank_chain_and_sum(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "subj string, obj string"
    )
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, max_iter=50).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    assert ranks["c"] > ranks["b"] > ranks["a"]


def test_pagerank_star_hub_dominates(spark):
    edges = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        "subj string, obj string",
    )
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, max_iter=50).collect()}
    assert ranks["hub"] == max(ranks.values())
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_personalized_teleports_to_seed(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c")],
        "subj string, obj string",
    )
    seeds = spark.createDataFrame([("a",)], "id string")
    ranks = {r["id"]: r["rank"]
             for r in pagerank(edges, personalization=seeds, max_iter=50).collect()}
    # teleport mass flows only into a's component
    assert ranks["a"] + ranks["b"] > 0.99
    assert ranks["c"] < 1e-6 and ranks["d"] < 1e-6


def test_pagerank_local_matches_distributed(spark):
    """The size-gated local path must agree with the iterative-DataFrame
    path on every teleport flavor (uniform, seed set, weighted reset) —
    same update rule and convergence schedule, so agreement to 1e-9 after
    float-sum reordering. 'd' is dangling (no out-edges) to exercise the
    dangling-mass fold on both paths."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")],
        "subj string, obj string",
    )
    seeds = spark.createDataFrame([("a",), ("zz",)], "id string")
    weighted = spark.createDataFrame(
        [("a", 3.0), ("c", 1.0)], "id string, weight double"
    )
    for pers in (None, seeds, weighted):
        local = {
            r["id"]: r["rank"]
            for r in pagerank(
                edges, personalization=pers, max_iter=17, strategy="local"
            ).collect()
        }
        dist = {
            r["id"]: r["rank"]
            for r in pagerank(
                edges, personalization=pers, max_iter=17, strategy="distributed"
            ).collect()
        }
        assert set(local) == set(dist)
        for k in local:
            assert local[k] == pytest.approx(dist[k], abs=1e-9), (pers, k)


def test_pagerank_duplicate_weighted_seeds_agree(spark):
    """Regression (ADVICE r3): duplicate ids in a weighted personalization
    DataFrame used to diverge (local dict last-wins vs distributed join
    row duplication / double-counted mass). Weights are now pre-aggregated
    by id (sum) before dispatch, so both paths agree, emit one rank row
    per node, and match an explicitly pre-summed input."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "subj string, obj string",
    )
    dup = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("c", 1.0)], "id string, weight double"
    )
    summed = spark.createDataFrame(
        [("a", 3.0), ("c", 1.0)], "id string, weight double"
    )
    results = {}
    for name, pers, strat in (
        ("local_dup", dup, "local"),
        ("dist_dup", dup, "distributed"),
        ("dist_summed", summed, "distributed"),
    ):
        rows = pagerank(
            edges, personalization=pers, max_iter=17, strategy=strat
        ).collect()
        assert len(rows) == 4, f"{name}: duplicate rank rows emitted"
        results[name] = {r["id"]: r["rank"] for r in rows}
    for k in results["local_dup"]:
        assert results["local_dup"][k] == pytest.approx(
            results["dist_dup"][k], abs=1e-9
        )
        assert results["dist_dup"][k] == pytest.approx(
            results["dist_summed"][k], abs=1e-9
        )


def test_pagerank_auto_gates_on_edge_count(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "subj string, obj string"
    )
    # 2 edges > threshold 1 → distributed; result identical either way
    ranks = {
        r["id"]: r["rank"]
        for r in pagerank(edges, max_iter=10, local_threshold=1).collect()
    }
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    with pytest.raises(ValueError, match="strategy"):
        pagerank(edges, strategy="bogus")


def test_keywords_tf_top_k(spark):
    df = spark.createDataFrame(
        [(1, "graph graph graph spark spark node the with from about")],
        "doc_id long, text string",
    )
    got = [(r["word"], r["cnt"], r["krank"])
           for r in keywords_tf(df, max_keywords=2).orderBy("krank").collect()]
    assert got == [("graph", 3, 1), ("spark", 2, 2)]


def test_temporal_snapshot_semantics(spark):
    rows = [
        # interval edge active [10, 20]
        ("a", "b", datetime(2024, 1, 10), datetime(2024, 1, 20), None),
        # point edge at 15
        ("c", "d", None, None, datetime(2024, 1, 15)),
        # point edge at 25
        ("e", "f", None, None, datetime(2024, 1, 25)),
    ]
    df = spark.createDataFrame(
        rows,
        "src string, dst string, valid_from timestamp, valid_to timestamp, ts timestamp",
    )
    at15 = {(r["src"], r["dst"]) for r in snapshot_at(df, datetime(2024, 1, 15)).collect()}
    assert at15 == {("a", "b"), ("c", "d")}
    at20 = {(r["src"], r["dst"]) for r in snapshot_at(df, datetime(2024, 1, 20)).collect()}
    assert at20 == {("a", "b")}  # interval inclusive, no point edge at 20
    rng = {
        (r["src"], r["dst"])
        for r in snapshot_range(df, datetime(2024, 1, 21), datetime(2024, 1, 30)).collect()
    }
    assert rng == {("e", "f")}


def test_semantic_edges_exact_and_lsh_agree_on_tight_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "cluster_id long, embedding array<double>")
    exact = {(r["src"], r["dst"]): r["similarity"]
             for r in semantic_similarity_edges(df, threshold=0.9).collect()}
    assert set(exact) == {(1, 2), (2, 1)}
    assert exact[(1, 2)] > 0.99
    lsh = {(r["src"], r["dst"])
           for r in semantic_similarity_edges(
               df, threshold=0.9, method="lsh", n_planes=4, n_tables=6
           ).collect()}
    assert lsh == set(exact)  # near-identical vectors always share buckets


def test_semantic_edges_respects_max_connections(spark):
    rows = [(i, [1.0, float(i) * 1e-4, 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "cluster_id long, embedding array<double>")
    got = semantic_similarity_edges(df, threshold=0.5, max_connections=3).collect()
    per_src = {}
    for r in got:
        per_src.setdefault(r["src"], []).append(r["dst"])
    assert all(len(v) <= 3 for v in per_src.values())
    assert len(per_src) == 8


def test_hybrid_search_fuses_bm25_and_vector(spark):
    """hybrid_search (retrieval/hybrid.rs:168): a doc matching the query
    terms must rank in the fused top list; docs in both lists carry
    n_lists=2; scores follow the RRF formula for the observed ranks."""
    from graphrag_rs_spark.operators.retrieval import hybrid_search

    rows = [
        (0, "spark table scan merge window join shuffle"),
        (1, "spark window merge"),
        (2, "completely unrelated prose about gardening and weather"),
        (3, "table scan with predicate pushdown in spark"),
        (4, "window functions and merge strategies for big table scan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = hybrid_search(
        docs, "spark table scan merge window", k_each=5, top_n=5
    ).collect()
    assert got, "hybrid search returned nothing"
    by_id = {r["item_id"]: r for r in got}
    # doc 0 contains every query term -> must be fused in
    assert 0 in by_id
    assert all(1 <= r["n_lists"] <= 2 for r in got)
    # rrf_score bounded by n_lists / (k + 1)
    assert all(r["rrf_score"] <= r["n_lists"] / 61.0 + 1e-12 for r in got)
    # deterministic: re-run yields identical rows
    again = hybrid_search(
        docs, "spark table scan merge window", k_each=5, top_n=5
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
