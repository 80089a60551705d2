"""LightRAG dual-level retrieval: merge-loop twins + Spark parity.

The merge strategies (lightrag/dual_retrieval.rs:197-324) are pinned by
running the reference's ACTUAL loop shapes in Python against the Spark
window implementation on batteries with duplicates, exhausted sides and
multiple queries. Keyword extraction vectors port
keyword_extraction.rs:196-240 + the fallback path (rs:167-188).
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.dual_retrieval import (
    extract_json,
    parse_keywords_response,
)

# --- loop twins (verbatim re-expressions of the rust loops) ---------------


def interleave_twin(high, low, top_k):
    # dual_retrieval.rs:212-250
    seen, merged = set(), []
    hi, li = iter(high), iter(low)
    h_left, l_left = len(high), len(low)
    use_high = True
    while len(merged) < top_k:
        if use_high:
            c = next(hi, None)
            h_left -= c is not None
        else:
            c = next(li, None)
            l_left -= c is not None
        if c is not None:
            if c[0] not in seen:
                seen.add(c[0])
                merged.append(c)
        elif h_left == 0 and l_left == 0:
            break
        use_high = not use_high
    return merged


def concat_twin(first, second, top_k):
    # dual_retrieval.rs:253-283
    seen, merged = set(), []
    for c in list(first) + list(second):
        if len(merged) >= top_k:
            break
        if c[0] not in seen:
            seen.add(c[0])
            merged.append(c)
    return merged


def weighted_twin(high, low, top_k, hw=0.6, lw=0.4):
    # dual_retrieval.rs:286-324 — stable sort, insertion order high→low
    allc = [(c, c[1] * hw) for c in high] + [(c, c[1] * lw) for c in low]
    allc.sort(key=lambda p: -p[1])  # python sort is stable, like rust
    seen, merged = set(), []
    for c, _ in allc:
        if c[0] not in seen:
            seen.add(c[0])
            merged.append(c)
        if len(merged) >= top_k:
            break
    return merged


# --- keyword extraction vectors -------------------------------------------


class TestKeywordRules:
    def test_extract_json_formats(self):
        # keyword_extraction.rs:196-229 — three response shapes
        responses = [
            '{"high_level": ["test"], "low_level": ["data"]}',
            'Here\'s the result: {"high_level": ["test"], '
            '"low_level": ["data"]}',
            '\n{\n  "high_level": ["test"],\n  "low_level": ["data"]\n}\n',
        ]
        for r in responses:
            parsed = parse_keywords_response(r)
            assert parsed == {"high_level": ["test"],
                              "low_level": ["data"]}, r

    def test_extract_json_none(self):
        assert extract_json("no braces here") is None
        assert parse_keywords_response("nope") is None

    def test_validation_gates(self):
        # keyword_extraction.rs:146-165: 0 keywords or >20 fail
        assert parse_keywords_response(
            '{"high_level": [], "low_level": []}') is None
        too_many = '{"high_level": %s, "low_level": ["x"]}' % (
            str([f"k{i}" for i in range(20)]).replace("'", '"'))
        assert parse_keywords_response(too_many) is None
        # malformed types fail closed
        assert parse_keywords_response(
            '{"high_level": "not-a-list", "low_level": []}') is None


@pytest.mark.usefixtures("spark")
class TestSparkOperators:
    def _results_df(self, spark, rows):
        return spark.createDataFrame(
            rows, "query string, id string, score double, rank long")

    # candidate fixtures with a cross-level duplicate ("b") and uneven
    # lengths so one side exhausts mid-merge
    HIGH = [("q1", "a", 0.9, 1), ("q1", "b", 0.8, 2), ("q1", "c", 0.7, 3),
            ("q1", "d", 0.6, 4)]
    LOW = [("q1", "b", 0.95, 1), ("q1", "e", 0.5, 2)]

    def _twin_rows(self, side_rows):
        return [(r[1], r[2]) for r in side_rows]

    @pytest.mark.parametrize("strategy,top_k", [
        ("interleave", 4), ("interleave", 10), ("high_first", 3),
        ("low_first", 3), ("weighted", 4), ("weighted", 2),
    ])
    def test_merge_matches_loop_twin(self, spark, strategy, top_k):
        from graphrag_rs_spark.operators.dual_retrieval import (
            merge_dual_results,
        )

        high, low = self._results_df(spark, self.HIGH), self._results_df(
            spark, self.LOW)
        got = [
            r["id"] for r in merge_dual_results(
                high, low, strategy=strategy, top_k=top_k)
            .orderBy("merged_rank").collect()
        ]
        h, l = self._twin_rows(self.HIGH), self._twin_rows(self.LOW)
        if strategy == "interleave":
            want = interleave_twin(h, l, top_k)
        elif strategy == "high_first":
            want = concat_twin(h, l, top_k)
        elif strategy == "low_first":
            want = concat_twin(l, h, top_k)
        else:
            want = weighted_twin(h, l, top_k)
        assert got == [c[0] for c in want], strategy

    def test_merge_multi_query_partitioning(self, spark):
        from graphrag_rs_spark.operators.dual_retrieval import (
            merge_dual_results,
        )

        high = self._results_df(
            spark, self.HIGH + [("q2", "x", 0.9, 1)])
        low = self._results_df(
            spark, self.LOW + [("q2", "x", 0.8, 1), ("q2", "y", 0.7, 2)])
        out = merge_dual_results(high, low, strategy="interleave", top_k=5)
        got = {q: [r["id"] for r in rows] for q, rows in (
            (q, sorted((r for r in out.collect() if r["query"] == q),
                       key=lambda r: r["merged_rank"]))
            for q in ("q1", "q2"))}
        assert got["q2"] == ["x", "y"]
        assert got["q1"] == [c[0] for c in interleave_twin(
            self._twin_rows(self.HIGH), self._twin_rows(self.LOW), 5)]

    def test_unknown_strategy_raises(self, spark):
        from graphrag_rs_spark.operators.dual_retrieval import (
            merge_dual_results,
        )

        df = self._results_df(spark, self.HIGH)
        with pytest.raises(ValueError):
            merge_dual_results(df, df, strategy="random")

    def test_fallback_keywords_expr(self, spark):
        from graphrag_rs_spark.operators.dual_retrieval import (
            extract_dual_keywords,
        )

        # rs:174-180 — >3 chars, take 10, lowercase; high level empty
        q = ("The QUICK brown Foxes jumped over thirteen lazy dogs while "
             "Eleven more watched from afar silently")
        df = spark.createDataFrame([(q,), ("a an to of",)], "query string")
        got = {r["query"]: r for r in extract_dual_keywords(df).collect()}
        want = [w.lower() for w in q.split() if len(w) > 3][:10]
        assert list(got[q]["low_level"]) == want
        assert list(got[q]["high_level"]) == []
        assert list(got["a an to of"]["low_level"]) == []

    def test_fallback_keyword_byte_length_both_paths(self, spark):
        # keyword_extraction.rs:174-180 filters on BYTE length (Rust
        # str::len): a 2-char CJK word (6 bytes) must pass on both the
        # JVM expression path and the per-row Python fallback — the two
        # paths previously disagreed (chars vs bytes)
        from graphrag_rs_spark.operators.dual_retrieval import (
            extract_dual_keywords,
            fallback_low_keywords,
        )

        q = "日本 ab cd 東京タワー data"
        df = spark.createDataFrame([(q,)], "query string")
        jvm = list(
            extract_dual_keywords(df).collect()[0]["low_level"]
        )
        assert jvm == fallback_low_keywords(q) == ["日本", "東京タワー", "data"]
        # and the llm_fn parse-failure fallback agrees too
        bad = {r["query"]: r for r in extract_dual_keywords(
            df, llm_fn=lambda p: "not json").collect()}
        assert list(bad[q]["low_level"]) == jvm

    def test_llm_path_parses_and_falls_back(self, spark):
        from graphrag_rs_spark.operators.dual_retrieval import (
            extract_dual_keywords,
        )

        def canned(prompt: str) -> str:
            if "alpha" in prompt:
                return ('result: {"high_level": ["topics"], '
                        '"low_level": ["alpha"]}')
            return "no json at all"

        df = spark.createDataFrame(
            [("alpha question",), ("malformed response query",)],
            "query string")
        got = {r["query"]: r for r in
               extract_dual_keywords(df, llm_fn=canned).collect()}
        assert list(got["alpha question"]["high_level"]) == ["topics"]
        assert list(got["alpha question"]["low_level"]) == ["alpha"]
        # fallback for the malformed one: query terms >3 chars lowercased
        assert list(got["malformed response query"]["low_level"]) == [
            "malformed", "response", "query"]

    def test_dual_retrieve_composed(self, spark):
        from graphrag_rs_spark.operators.dual_retrieval import (
            dual_retrieve,
        )

        topics = spark.createDataFrame(
            [("t1", "community summary about quantum computing research"),
             ("t2", "topic summary about cooking recipes")],
            "doc_id string, text string")
        chunks = spark.createDataFrame(
            [("c1", "Alice studies quantum computing at the lab"),
             ("c2", "Bob cooks pasta with tomato sauce"),
             ("c3", "quantum entanglement experiments with Alice")],
            "doc_id string, text string")
        out = dual_retrieve(
            topics, chunks, "quantum computing experiments",
            top_k=5, strategy="interleave").orderBy("merged_rank").collect()
        # fallback keywords are all low-level → only the chunk corpus hits
        assert all(r["source_level"] == "low" for r in out)
        ids = [r["id"] for r in out]
        assert set(ids) <= {"c1", "c2", "c3"}
        assert ids[0] in ("c1", "c3")

        def canned(prompt: str) -> str:
            return ('{"high_level": ["quantum computing"], '
                    '"low_level": ["Alice", "experiments"]}')

        both = dual_retrieve(
            topics, chunks, "quantum computing experiments", top_k=5,
            strategy="high_first", llm_fn=canned)
        levels = {r["source_level"] for r in both.collect()}
        assert levels == {"high", "low"}
