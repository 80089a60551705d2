"""Fixture-based text-pipeline integration tests, ported from the
reference's graphrag-core/tests/text_pipeline_fixtures.rs.

The reference runs its chunk→enrich pipeline over two real fixture
documents and asserts BEHAVIOR (chunk counts, heading detection,
size bounds, keyword presence, overlap, statistics) rather than exact
content. The fixture texts below are original to this repo (same shape:
a ~3 kchar headed article about knowledge graphs and a multi-level
technical markdown document) so the behavioral assertions port 1:1
without copying reference data files.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.operators.chunking import chunk_documents
from graphrag_rs_spark.operators.enrichment import enrich_chunks

_PARA = (
    "Entities and relationships form the backbone of any graph model. "
    "Each node carries a type and a confidence score, while edges record "
    "the predicate that links two nodes together. When documents are "
    "processed at scale, the extraction stage has to stay deterministic "
    "so that repeated runs produce identical graphs. "
)

ARTICLE = (
    "# Understanding Knowledge Graphs\n\n"
    "## Introduction\n\n"
    "Knowledge Graphs organize information as entities and relationships "
    "so that machines can traverse meaning rather than match strings. "
    "This article walks through how Knowledge Graphs are constructed "
    "from raw conversational text, and why graph-shaped retrieval beats "
    "flat keyword search for multi-hop questions.\n\n" + _PARA + "\n\n"
    "## Construction Pipeline\n\n"
    "The construction pipeline begins with chunking, which splits long "
    "documents into overlapping windows that preserve sentence "
    "boundaries. Extraction then finds entity mentions and emits subject "
    "predicate object triples with offsets back into the source text.\n\n"
    + _PARA + "\n\n"
    "## Canonicalization\n\n"
    "Canonicalization merges spelling variants of the same entity into "
    "one canonical node. Blocking keys keep the candidate pair count "
    "manageable, and connected components assign a stable cluster "
    "identifier to every member of a merged group.\n\n" + _PARA + "\n\n"
    "## Applications\n\n"
    "Knowledge Graphs power question answering, recommendation, fraud "
    "detection, and retrieval augmented generation. Hybrid search mixes "
    "lexical scores with embedding similarity and fuses both rankings.\n\n"
    + _PARA + "\n\n"
    "## Evaluation Methods\n\n"
    "Evaluating a constructed graph means checking precision and recall "
    "of the emitted triples against a trusted oracle, then checking that "
    "throughput scales with the number of executors. A graph that is "
    "correct at sixty conversations but collapses at one hundred "
    "thousand has failed the second half of the test.\n\n" + _PARA + "\n\n"
    "## Conclusion\n\n"
    "Graph construction is a pipeline of deterministic stages, and every "
    "stage can be expressed as a dataflow over distributed tables. "
    "Knowledge Graphs reward the effort with explainable retrieval.\n"
)

TECHNICAL_MD = (
    "# GraphRAG System Architecture\n\n"
    "## Overview\n\n"
    "The engine is organized as a stack of independent stages that "
    "communicate only through tables.\n\n"
    "### System Components\n\n"
    "The chunker, the extractor, the canonicalizer, and the graph "
    "builder each read one table and write another.\n\n"
    "### Data Flow\n\n"
    "Conversations become documents, documents become chunks, chunks "
    "become mentions and triples, and triples become nodes and edges.\n\n"
    "## Deployment\n\n"
    "The same plan runs on a laptop and on a thousand executor cluster "
    "because the dataflow never assumes locality.\n\n"
    "### Scaling Notes\n\n"
    "Broadcast the small side, salt the skewed key, and let adaptive "
    "execution re-plan the shuffles at runtime.\n"
)


def _pipeline(spark, text, chunk_size=500, overlap=50):
    docs = spark.createDataFrame(
        [("conv0", "doc0", text)], "conv_id string, doc_id string, full_text string"
    )
    cfg = PipelineConfig(
        chunk_size=chunk_size, chunk_overlap=overlap, chunker="fixed"
    )
    chunks = chunk_documents(docs, cfg)
    enriched = enrich_chunks(
        chunks.select("chunk_id", "doc_id", "text", "start"),
        docs.select("doc_id", "full_text"),
    )
    return (
        sorted(chunks.collect(), key=lambda r: r["chunk_idx"]),
        {r["chunk_id"]: r for r in enriched.collect()},
    )


def test_complete_pipeline_on_real_article(spark):
    # text_pipeline_fixtures.rs:28-110
    assert len(ARTICLE) > 1000
    assert "Knowledge Graphs" in ARTICLE
    chunks, meta = _pipeline(spark, ARTICLE)
    assert len(chunks) >= 4, f"expected >=4 chunks, got {len(chunks)}"
    with_headings = [
        c for c in chunks if meta[c["chunk_id"]]["chapter"] is not None
    ]
    assert with_headings, "expected some chunks with detected headings"
    heading_names = {
        meta[c["chunk_id"]]["chapter"]
        for c in chunks
        if meta[c["chunk_id"]]["chapter"]
    } | {
        meta[c["chunk_id"]]["section"]
        for c in chunks
        if meta[c["chunk_id"]]["section"]
    }
    assert any(
        h and "Introduction" in h for h in heading_names
    ), heading_names
    for c in chunks:
        assert c["text"], f"chunk {c['chunk_idx']} empty"
        assert len(c["text"]) <= 600, (
            f"chunk {c['chunk_idx']} exceeds bound: {len(c['text'])}"
        )
    with_keywords = [
        c for c in chunks if meta[c["chunk_id"]]["keywords"]
    ]
    assert with_keywords, "expected some chunks with extracted keywords"


def test_markdown_parsing_on_technical_doc(spark):
    # text_pipeline_fixtures.rs:113-174
    assert "# GraphRAG System Architecture" in TECHNICAL_MD
    assert "## Overview" in TECHNICAL_MD
    assert "### System Components" in TECHNICAL_MD
    chunks, meta = _pipeline(spark, TECHNICAL_MD, chunk_size=300, overlap=30)
    assert len(chunks) >= 3
    levels = {meta[c["chunk_id"]]["structural_level"] for c in chunks}
    assert any(lv and lv >= 2 for lv in levels), levels
    paths = [
        meta[c["chunk_id"]]["heading_path"]
        for c in chunks
        if meta[c["chunk_id"]]["heading_path"]
    ]
    assert any(
        len(p) >= 2 and p[0] == "GraphRAG System Architecture" for p in paths
    ), paths


def test_keyword_extraction_quality(spark):
    # text_pipeline_fixtures.rs:184-230 — chunks about knowledge graphs
    # carry topical keywords, lowercase, no stopwords
    chunks, meta = _pipeline(spark, ARTICLE)
    kg_chunks = [
        c for c in chunks if "knowledge" in c["text"].lower()
    ]
    assert kg_chunks
    from graphrag_rs_spark.operators.retrieval import KEYWORD_STOPWORDS

    topical = 0
    for c in kg_chunks:
        kws = meta[c["chunk_id"]]["keywords"] or []
        for k in kws:
            assert k == k.lower(), k
            assert k not in KEYWORD_STOPWORDS, k
        if any(k in ("knowledge", "graphs", "graph", "entities") for k in kws):
            topical += 1
    assert topical > 0


def test_chunk_overlap_on_real_text(spark):
    # text_pipeline_fixtures.rs:240-290 — consecutive chunk windows
    # overlap by construction (start_{i+1} < end_i) and re-cover the
    # document without gaps
    chunks, _ = _pipeline(spark, ARTICLE)
    assert len(chunks) >= 2
    for a, b in zip(chunks, chunks[1:]):
        assert b["start"] < a["end"], (a["chunk_idx"], b["chunk_idx"])
        assert b["start"] > a["start"]
    covered_to = max(c["end"] for c in chunks)
    assert covered_to >= len(ARTICLE) - 1


def test_document_statistics_on_real_content(spark):
    # text_pipeline_fixtures.rs:295-338
    assert ARTICLE.count("\n") > 25
    assert len(ARTICLE.split()) > 400
    from graphrag_rs_spark.operators.text_analysis import text_stats

    df = spark.createDataFrame(
        [("doc0", ARTICLE)], "doc_id string, text string"
    )
    row = text_stats(df).collect()[0]
    # exact splitter semantics are pinned against the twin in
    # tests/test_plaintext_layout.py; here assert the rs bounds
    assert row["word_count"] > 400
    assert row["char_count"] == len(ARTICLE)
    assert row["sentence_count"] > 10


def test_edge_case_short_titled_document(spark):
    # text_pipeline_fixtures.rs:344-362 — a short doc with only a title
    # still yields one chunk whose chapter is the title
    short = "# Short Title\n\nOne modest paragraph under the title."
    chunks, meta = _pipeline(spark, short, chunk_size=500, overlap=50)
    assert len(chunks) >= 1
    assert meta[chunks[0]["chunk_id"]]["chapter"] == "Short Title"
