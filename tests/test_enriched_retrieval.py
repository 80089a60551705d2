"""Enriched metadata-aware retrieval: twin vectors + Spark parity
(retrieval/enriched.rs)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.rules.enriched import (
    count_keyword_matches,
    extract_structure_references,
    matches_query,
    matches_structure,
    metadata_boost,
    query_words,
    structure_boost,
)


class TestRuleTwins:
    def test_query_words_filter(self):
        # >3 bytes, lowercased — every word here is exactly 3 chars
        assert query_words("The Cat saw a DOG run") == set()
        assert query_words("alpha be gamma") == {"alpha", "gamma"}

    def test_structure_references(self):
        refs = extract_structure_references(
            "what does socrates say in chapter 1?")
        assert refs == ["chapter 1"]
        refs2 = extract_structure_references(
            "compare section 2.1 and part iv")
        assert "section 2.1" in refs2 and "part iv" in refs2
        # the uppercase "direct mention" branch is dead (input lowered)
        assert extract_structure_references("introduction overview") == []

    def test_keyword_matches_count_duplicates(self):
        qw = {"spark", "graph"}
        assert count_keyword_matches(["Spark", "spark", "other"], qw) == 2

    def test_matches_query_majority(self):
        qw = {"quantum", "entanglement", "physics", "theory"}
        # needs >= 2 of 4
        assert matches_query("quantum theory summary", qw)
        assert not matches_query("quantum only", qw)
        # single-word query needs >= 1
        assert matches_query("about spark", {"spark"})

    def test_structure_boost_sums(self):
        refs = ["chapter 1", "section 2"]
        got = structure_boost("Chapter 1: Intro", "Section 2", None, refs)
        assert got == pytest.approx(0.5 + 0.3)
        assert structure_boost(None, None, None, refs) is None
        assert structure_boost("Chapter 9", None, None, []) is None

    def test_metadata_boost_composition(self):
        # keywords: 2 matches of 3 query words → 2/3·0.3;
        # chapter matches "chapter 1" → 0.5·0.2; summary hits 2/3 ≥ 1
        # → 0.15; completeness 0.8 > 0.7 → 0.05
        boost = metadata_boost(
            "explain quantum physics chapter 1",
            ["quantum", "physics"],
            "Chapter 1", None, None,
            "summary about quantum physics", 0.8)
        qw = query_words("explain quantum physics chapter 1")
        want = (2 / len(qw)) * 0.3 + 0.5 * 0.2 + 0.15 + 0.05
        assert boost == pytest.approx(want)

    def test_matches_structure(self):
        assert matches_structure("Chapter 1", None, None, ["chapter 1"])
        assert not matches_structure("Chapter 2", None, None, ["chapter 1"])
        assert matches_structure(None, "Section 2.1", None, ["section 2.1"])


ENRICHED_ROWS = [
    # chunk_id, chapter, section, subsection, keywords, summary, meta_conf
    ("c1", "Chapter 1: Intro", "Section 1.1", None,
     ["quantum", "physics"], "summary about quantum physics", 0.8),
    ("c2", "Chapter 2: Methods", None, None,
     ["cooking", "recipes"], None, 0.4),
    ("c3", None, None, None, [], None, 0.1),
    ("c4", "Chapter 1: Intro", None, None,
     ["quantum"], "unrelated text entirely", 0.9),
]

SCHEMA = ("chunk_id string, chapter string, section string, "
          "subsection string, keywords array<string>, summary string, "
          "meta_confidence double")


@pytest.mark.usefixtures("spark")
class TestSparkOperators:
    def _enriched(self, spark):
        return spark.createDataFrame(ENRICHED_ROWS, SCHEMA)

    def test_metadata_search_matches_twin(self, spark):
        from graphrag_rs_spark.operators.enriched_retrieval import (
            metadata_search,
        )

        query = "explain quantum physics chapter 1"
        got = {r["chunk_id"]: r for r in
               metadata_search(self._enriched(spark), query).collect()}
        for (cid, ch, sec, sub, kws, summ, conf) in ENRICHED_ROWS:
            want = metadata_boost(query, kws, ch, sec, sub, summ, conf)
            if not kws or want <= 0.05:
                assert cid not in got, cid
            else:
                assert got[cid]["metadata_boost"] == pytest.approx(
                    want), cid
                assert got[cid]["score"] == pytest.approx(
                    min(0.5 + want, 1.0)), cid

    def test_metadata_search_base_scores(self, spark):
        from graphrag_rs_spark.operators.enriched_retrieval import (
            metadata_search,
        )

        base = spark.createDataFrame(
            [("c1", 0.9)], "chunk_id string, score double")
        query = "explain quantum physics chapter 1"
        got = {r["chunk_id"]: r for r in metadata_search(
            self._enriched(spark), query, base_results=base).collect()}
        want = metadata_boost(
            query, ["quantum", "physics"], "Chapter 1: Intro",
            "Section 1.1", None, "summary about quantum physics", 0.8)
        assert got["c1"]["score"] == pytest.approx(min(0.9 + want, 1.0))

    def test_filter_by_structure(self, spark):
        from graphrag_rs_spark.operators.enriched_retrieval import (
            filter_by_structure,
        )

        results = spark.createDataFrame(
            [("c1", 0.9), ("c2", 0.8), ("c3", 0.7)],
            "chunk_id string, score double")
        out = filter_by_structure(
            results, self._enriched(spark), "what is in chapter 1?")
        kept = {r["chunk_id"] for r in out.collect()}
        # c1 matches chapter 1; c2 is chapter 2 → dropped; c3 has no
        # metadata → kept (reference default true)
        assert kept == {"c1", "c3"}
        # no structure refs → passthrough
        noop = filter_by_structure(
            results, self._enriched(spark), "plain query")
        assert {r["chunk_id"] for r in noop.collect()} == {"c1", "c2",
                                                           "c3"}

    def test_boost_with_metadata(self, spark):
        from graphrag_rs_spark.operators.enriched_retrieval import (
            boost_with_metadata,
        )

        results = spark.createDataFrame(
            [("c1", 0.5), ("c2", 0.5)], "chunk_id string, score double")
        # query contains the chapter string of c1 lowercased
        query = "tell me about chapter 1: intro quantum stuff"
        out = {r["chunk_id"]: r["score"] for r in boost_with_metadata(
            results, self._enriched(spark), query).collect()}
        qn = len(query_words(query))
        # c1: 1 keyword match (quantum) → +1/qn·0.2, chapter in query
        # → +0.15
        assert out["c1"] == pytest.approx(
            min(min(0.5 + (1 / qn) * 0.2, 1.0) + 0.15, 1.0))
        assert out["c2"] == pytest.approx(0.5)

    def test_chapter_section_chunks(self, spark):
        from graphrag_rs_spark.operators.enriched_retrieval import (
            chunks_in_chapter,
            chunks_in_section,
        )

        e = self._enriched(spark)
        assert {r["chunk_id"] for r in
                chunks_in_chapter(e, "chapter 1").collect()} == {"c1",
                                                                 "c4"}
        assert {r["chunk_id"] for r in
                chunks_in_section(e, "section 1.1").collect()} == {"c1"}

    def test_search_by_keywords(self, spark):
        from graphrag_rs_spark.operators.enriched_retrieval import (
            search_by_keywords,
        )

        out = search_by_keywords(
            self._enriched(spark), ["Quantum", "cooking", "absent"],
            top_k=10).collect()
        scores = {r["chunk_id"]: r["score"] for r in out}
        assert scores["c1"] == pytest.approx(1 / 3)   # quantum only
        assert scores["c2"] == pytest.approx(1 / 3)   # cooking only
        assert scores["c4"] == pytest.approx(1 / 3)
        assert "c3" not in scores

    def test_search_by_keywords_empty_keywords_keeps_schema(self, spark):
        # the empty-keywords branch must return the SAME columns as the
        # scored path (zero rows), so .select of metadata columns and
        # cross-query unions work on either branch
        from graphrag_rs_spark.operators.enriched_retrieval import (
            search_by_keywords,
        )

        e = self._enriched(spark)
        scored = search_by_keywords(e, ["quantum"], top_k=5)
        empty = search_by_keywords(e, [], top_k=5)
        assert empty.columns == scored.columns
        assert empty.count() == 0
        assert scored.unionByName(empty).count() == scored.count()
