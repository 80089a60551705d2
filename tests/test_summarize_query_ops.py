"""TF-IDF keywords (text/keyword_extraction.rs), extractive summarization
tree (summarization/mod.rs), query algebra (query/optimizer.rs), and
cross-document linking (corpus/entity_linker.rs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.cross_doc import exact_match_linking, link_entities
from graphrag_rs_spark.operators.retrieval import tfidf_keywords
from graphrag_rs_spark.operators.summarize import build_summary_tree, tree_roots
from graphrag_rs_spark.plans.query_ops import (
    EntityScan,
    Filter,
    GraphTables,
    Join,
    Limit,
    Neighbors,
    QueryOp,
    Union,
    compile_op,
)
from graphrag_rs_spark.rules.summarize import (
    extract_sentences,
    extractive_summary,
    score_sentence,
)


class TestTfidf:
    def test_scores_and_ranks(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "quantum quantum physics common"),
                (2, "common words common words biology"),
            ],
            "doc_id long, text string",
        )
        rows = {
            (r["doc_id"], r["term"]): r["score"]
            for r in tfidf_keywords(docs, top_k=5).collect()
        }
        # 'quantum': tf 2/4 in doc1, df 1 of 2 docs -> 0.5*ln(2)
        assert rows[(1, "quantum")] == pytest.approx(0.5 * math.log(2.0))
        # 'common' appears in both docs -> idf ln(1)=0 -> score 0
        assert rows[(1, "common")] == pytest.approx(0.0)

    def test_tokenizer_rules(self, spark):
        docs = spark.createDataFrame(
            [(1, "The 123 ab abc-def abc-def under_score")],
            "doc_id long, text string",
        )
        terms = {
            r["term"] for r in tfidf_keywords(docs, top_k=10).collect()
        }
        # 'the' stopword, '123' pure number, 'ab' too short all dropped;
        # hyphen/underscore retained
        assert terms == {"abc-def", "under_score"}


class TestSummaryRules:
    def test_extract_sentences_drops_enders(self):
        assert extract_sentences("One. Two! Three? tail") == [
            "One", "Two", "Three", "tail"
        ]

    def test_score_length_bands(self):
        words = ["alpha"] * 3
        short = score_sentence("a b", words)
        mid = score_sentence("one two three four five six", words)
        assert mid > short

    def test_single_sentence_identity(self):
        assert extractive_summary("only sentence") == "only sentence"

    def test_greedy_packing_respects_cap(self):
        text = "Repeated words words words here. Second sentence words. " * 3
        s = extractive_summary(text, max_summary_length=60)
        assert 0 < len(s) <= 61 + 60  # cap + at most a few separators

    def test_empty(self):
        assert extractive_summary("") == ""


class TestSummaryTree:
    @pytest.fixture(scope="class")
    def chunks(self, spark):
        rows = [
            ("d1", i, f"d1_{i}",
             f"Topic {i} sentence one words here. Topic {i} more words there.")
            for i in range(7)
        ] + [("d2", 0, "d2_0", "Lone chunk of doc two.")]
        return spark.createDataFrame(
            rows, "doc_id string, chunk_idx int, chunk_id string, text string"
        )

    def test_levels_and_roots(self, chunks):
        tree = build_summary_tree(chunks, merge_size=3)
        per_level = {
            (r["doc_id"], r["level"]): r["cnt"]
            for r in tree.groupBy("doc_id", "level")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        # 7 leaves -> 3 merged -> 1 root for d1; d2 is a single leaf
        assert per_level[("d1", 0)] == 7
        assert per_level[("d1", 1)] == 3
        assert per_level[("d1", 2)] == 1
        assert per_level[("d2", 0)] == 1 and ("d2", 1) not in per_level
        roots = {r["doc_id"]: r for r in tree_roots(tree).collect()}
        assert roots["d1"]["node_id"] == "level_2_0"
        assert len(roots["d1"]["chunk_ids"]) == 7
        assert roots["d2"]["node_id"] == "d2_0"

    def test_merged_content_and_summary(self, chunks):
        tree = build_summary_tree(chunks, merge_size=3)
        lvl1 = {
            r["node_id"]: r
            for r in tree.where("doc_id = 'd1' and level = 1").collect()
        }
        node = lvl1["level_1_0"]
        # children 0,1,2 concatenated in order with blank lines
        assert node["content"].index("Topic 0") < node["content"].index("Topic 2")
        assert "\n\n" in node["content"]
        from graphrag_rs_spark.rules.summarize import extractive_summary as es

        assert node["summary"] == es(node["content"], 200)
        assert len(node["keywords"]) <= 10


class TestQueryOps:
    @pytest.fixture(scope="class")
    def tables(self, spark):
        nodes = spark.createDataFrame(
            [
                ("p1", "Alice", "PERSON", 0.9),
                ("p2", "Bob", "PERSON", 0.8),
                ("o1", "Acme", "ORGANIZATION", 0.95),
                ("l1", "Paris", "LOCATION", 0.7),
            ],
            "cluster_id string, name string, entity_type string, confidence double",
        )
        edges = spark.createDataFrame(
            [
                ("p1", "WORKS_FOR", "o1", 0.6),
                ("p2", "KNOWS", "p1", 0.6),
                ("o1", "LOCATED_IN", "l1", 0.6),
            ],
            "subj string, pred string, obj string, confidence double",
        )
        return GraphTables(nodes, edges)

    def test_scan_filter_limit(self, tables):
        out = compile_op(
            Limit(Filter(EntityScan("PERSON"), "name", "Alice"), 5), tables
        ).collect()
        assert [r["cluster_id"] for r in out] == ["p1"]

    def test_neighbors_with_type_filter(self, tables):
        got = {
            r["cluster_id"]
            for r in compile_op(
                Neighbors(Filter(EntityScan("PERSON"), "name", "Alice"),
                          relation_type="WORKS_FOR", max_hops=1),
                tables,
            ).collect()
        }
        assert got == {"o1"}

    def test_neighbors_two_hops(self, tables):
        got = {
            r["cluster_id"]
            for r in compile_op(
                Neighbors(Filter(EntityScan("PERSON"), "name", "Alice"),
                          max_hops=2),
                tables,
            ).collect()
        }
        assert got == {"p2", "o1", "l1"}

    def test_union_and_inner_join(self, tables):
        u = compile_op(
            Union(EntityScan("PERSON"), EntityScan("LOCATION")), tables
        )
        assert u.count() == 3
        j = compile_op(
            Join(EntityScan("PERSON"), Filter(EntityScan("PERSON"), "name", "Bob")),
            tables,
        ).collect()
        assert [r["cluster_id"] for r in j] == ["p2"]


class TestCrossDoc:
    def test_exact_match_linking(self, spark):
        ents = spark.createDataFrame(
            [
                ("d1", "e1", "Acme Corp"),
                ("d2", "e2", "Acme Corp"),
                ("d2", "e3", "Acme Corp"),
                ("d1", "e4", "Alice"),
            ],
            "doc_id string, entity_id string, name string",
        )
        rows = {r["canonical_name"]: r for r in exact_match_linking(ents).collect()}
        acme = rows["Acme Corp"]
        assert acme["member_count"] == 3
        assert acme["document_frequency"] == 2
        assert acme["entity_type"] == "organization"
        assert rows["Alice"]["entity_type"] == "person"
        assert acme["aliases"] == ["Acme Corp"]

    def test_fuzzy_dispatch(self, spark):
        ents = spark.createDataFrame(
            [
                ("d1", "e1", "Jhon Smith"),
                ("d2", "e2", "John Smith"),
                ("d3", "e3", "Totally Different"),
            ],
            "doc_id string, entity_id string, name string",
        )
        ents = ents.withColumn("entity_type", F.lit("PERSON"))
        out = link_entities(ents, strategy="fuzzy", threshold=0.85)
        by_id = {r["entity_id"]: r["cluster_id"] for r in out.collect()}
        assert by_id["e1"] == by_id["e2"]
        assert by_id["e3"] != by_id["e1"]


class TestTreeQuery:
    def test_query_scores_and_level_bonus(self, spark):
        from graphrag_rs_spark.operators.summarize import query_tree

        rows = [
            ("d1", 0, 0, "leaf_0", "c", "Quantum physics remains strange today.",
             ["quantum", "physics"], ["c0"]),
            ("d1", 1, 0, "level_1_0", "c", "Combined summary about biology.",
             ["biology"], ["c0", "c1"]),
        ]
        tree = spark.createDataFrame(
            rows,
            "doc_id string, level int, node_idx bigint, node_id string, "
            "content string, summary string, keywords array<string>, "
            "chunk_ids array<string>",
        )
        out = query_tree(tree, "quantum physics discoveries", max_results=5)
        got = {r["node_id"]: r["score"] for r in out.collect()}
        # leaf: 2 keyword hits + word overlap 2/3*2 + level 0.5 = 3.8333...
        assert abs(got["leaf_0"] - (2.0 + (2 / 3) * 2.0 + 0.5)) < 1e-6
        # biology node: only level bonus 0.5/(1+1)=0.25 -> passes the 0.1 floor
        assert abs(got["level_1_0"] - 0.25) < 1e-6
        assert out.collect()[0]["node_id"] == "leaf_0"
