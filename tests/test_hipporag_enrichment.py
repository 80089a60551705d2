"""HippoRAG PPR retrieval (retrieval/hipporag_ppr.rs), query-focused
subgraph (traversal.rs:521), and chunk enrichment
(text/chunk_enricher.rs) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.enrichment import enrich_chunks
from graphrag_rs_spark.operators.hipporag import hipporag_retrieve
from graphrag_rs_spark.operators.traversal import query_focused_subgraph
from graphrag_rs_spark.rules.layout import (
    chunk_metadata,
    heading_path,
    parse_markdown_structure,
    section_for_offset,
)

MD = "\n".join(
    [
        "# Chapter 1",
        "intro text",
        "## Section 1.1",
        "body of section one point one",
        "### Subsection 1.1.1",
        "deep text",
        "## Section 1.2",
        "body of section one point two",
    ]
)


def test_markdown_structure_hierarchy():
    sections = parse_markdown_structure(MD)
    assert [s.heading.text for s in sections] == [
        "Chapter 1", "Section 1.1", "Subsection 1.1.1", "Section 1.2"
    ]
    assert sections[1].parent == 0
    assert sections[2].parent == 1
    assert sections[3].parent == 0
    deep_off = MD.index("deep text")
    idx = section_for_offset(sections, deep_off)
    assert heading_path(sections, idx) == [
        "Chapter 1", "Section 1.1", "Subsection 1.1.1"
    ]


def test_chunk_metadata_fields():
    sections = parse_markdown_structure(MD)
    off = MD.index("body of section one point one")
    meta = chunk_metadata(sections, off, "body", len(MD), ["body"], None)
    assert meta["chapter"] == "Chapter 1"
    assert meta["section"] == "Section 1.1"
    assert meta["subsection"] is None
    assert meta["structural_level"] == 2
    assert meta["position_in_document"] == pytest.approx(off / len(MD))
    # completeness: chapter+section+keywords+level+position+path = 6 of 9
    assert meta["meta_confidence"] == pytest.approx(6 / 9)


def test_enrich_chunks_cogroup(spark):
    docs = spark.createDataFrame([("d0", MD)], "doc_id string, full_text string")
    chunks = spark.createDataFrame(
        [
            ("c0", "d0", "intro text", MD.index("intro text")),
            ("c1", "d0", "deep text", MD.index("deep text")),
        ],
        "chunk_id string, doc_id string, text string, start int",
    )
    out = {r["chunk_id"]: r for r in enrich_chunks(chunks, docs).collect()}
    assert out["c0"]["chapter"] == "Chapter 1"
    assert out["c0"]["section"] is None
    assert out["c1"]["heading_path"] == [
        "Chapter 1", "Section 1.1", "Subsection 1.1.1"
    ]
    assert out["c1"]["structural_level"] == 3


def test_query_focused_subgraph_excludes_cross_fringe_edges(spark):
    # a-b-c and x-y-z chains bridged by c-x; seeds a and z with 2 hops:
    # c is in a's ego, x is in z's ego, but edge c-x belongs to NEITHER
    # single ego -> excluded (reference unions per-seed induced sets)
    edges = [("a", "b"), ("b", "c"), ("c", "x"), ("x", "y"), ("y", "z")]
    df = spark.createDataFrame(edges, "subj string, obj string")
    nodes, induced = query_focused_subgraph(
        df, ["a", "z"], expansion_hops=2, confidence=None
    )
    dist = {r["id"]: r["distance"] for r in nodes.collect()}
    assert dist == {"a": 0, "b": 1, "c": 2, "x": 2, "y": 1, "z": 0}
    got_edges = {(r["subj"], r["obj"]) for r in induced.collect()}
    assert ("c", "x") not in got_edges
    assert {("a", "b"), ("b", "c"), ("x", "y"), ("y", "z")} == got_edges


def test_hipporag_ranks_fact_linked_passages_first(spark):
    # passages p1..p3; entities e1 (in p1), e2 (in p1, p2), e3 (in p3);
    # the only fact links e1-e2 -> p1 (hosting both) must outrank p3
    facts = spark.createDataFrame(
        [("e1", "e2", 1.0)], "subject string, object string, score double"
    )
    ep = spark.createDataFrame(
        [("e1", "p1"), ("e2", "p1"), ("e2", "p2"), ("e3", "p3")],
        "entity_id string, passage_id string",
    )
    ps = spark.createDataFrame(
        [("p1", 0.5), ("p2", 0.5), ("p3", 0.5)],
        "passage_id string, score double",
    )
    edges = ep.select(
        F.col("entity_id").alias("src"), F.col("passage_id").alias("dst")
    )
    out = hipporag_retrieve(edges, facts, ep, ps, top_k_results=3)
    ranked = [r["passage_id"] for r in out.collect()]
    assert ranked[0] == "p1"
    assert set(ranked) == {"p1", "p2", "p3"}
