"""Chunk enrichment — structural metadata per chunk
(graphrag-rs text/chunk_enricher.rs:48-141 over the markdown layout
parser; rules in rules/layout.py).

Distribution shape: chunks and documents COGROUP on ``doc_id`` so each
document's structure is parsed exactly once per doc and only against its
own chunks — a co-partitioned Arrow pass, no broadcast of full texts and
no per-chunk re-parse. At scale both sides arrive hash-partitioned on
doc_id from the upstream assembly/chunking shuffle, so the cogroup
reuses that partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ENRICHED_SCHEMA = (
    "chunk_id string, doc_id string, chapter string, section string, "
    "subsection string, keywords array<string>, summary string, "
    "structural_level int, position_in_document double, "
    "heading_path array<string>, meta_confidence double"
)

# the 50-word stopword list the reference's enricher keywords use
_KEYWORDS_TOP_K = 5
_SUMMARY_MIN_LEN = 150


def enrich_chunks(
    chunks: DataFrame,
    documents: DataFrame,
    id_col: str = "chunk_id",
    doc_col: str = "doc_id",
    text_col: str = "text",
    full_text_col: str = "full_text",
    start_col: str = "start",
    layout: str = "markdown",
) -> DataFrame:
    """chunks + documents → one metadata row per chunk.

    ``layout`` picks the structure parser: ``"markdown"`` (markdown.rs
    port, the default and the reference's graph-build path),
    ``"plaintext"`` (parsers/plaintext.rs port: underline / ALL-CAPS /
    numbered-heading heuristics for documents with no markdown markup),
    or ``"html"`` (parsers/html.rs port: same-line <hN>…</hN> tags).
    All emit the same Section shape, so the per-chunk metadata rules
    (chunk_enricher.rs:82-141) compose unchanged.
    """
    if layout not in ("markdown", "plaintext", "html"):
        raise ValueError(f"unknown layout parser: {layout!r}")

    def enrich(chunk_pdf: "pd.DataFrame", doc_pdf: "pd.DataFrame"):
        import pandas as pd

        from graphrag_rs_spark.operators.retrieval import KEYWORD_STOPWORDS
        from graphrag_rs_spark.rules.layout import (
            chunk_metadata,
            parse_markdown_structure,
        )
        from graphrag_rs_spark.rules.html_layout import parse_html_structure
        from graphrag_rs_spark.rules.plaintext_layout import (
            parse_plaintext_structure,
        )
        from graphrag_rs_spark.rules.summarize import extractive_summary

        parse_structure = {
            "markdown": parse_markdown_structure,
            "plaintext": parse_plaintext_structure,
            "html": parse_html_structure,
        }[layout]

        def tf_keywords(text: str) -> list[str]:
            from collections import Counter

            toks = [
                t for t in (text or "").strip().lower().split()
                if len(t) > 3 and t not in KEYWORD_STOPWORDS
            ]
            top = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))
            return [w for w, _ in top[:_KEYWORDS_TOP_K]]

        empty = pd.DataFrame(
            [],
            columns=[
                "chunk_id", "doc_id", "chapter", "section", "subsection",
                "keywords", "summary", "structural_level",
                "position_in_document", "heading_path", "meta_confidence",
            ],
        )
        rows = []
        if len(doc_pdf) == 0 or len(chunk_pdf) == 0:
            return empty
        full_text = doc_pdf[full_text_col].iloc[0] or ""
        sections = parse_structure(full_text)
        for _, c in chunk_pdf.iterrows():
            text = c[text_col] or ""
            summary = (
                extractive_summary(text, _SUMMARY_MIN_LEN)
                if len(text) > _SUMMARY_MIN_LEN
                else None
            ) or None
            meta = chunk_metadata(
                sections, int(c[start_col]), text, len(full_text),
                tf_keywords(text), summary,
            )
            rows.append(
                {
                    "chunk_id": c[id_col],
                    "doc_id": c[doc_col],
                    **meta,
                }
            )
        return pd.DataFrame(rows) if rows else empty

    return (
        chunks.groupby(doc_col)
        .cogroup(documents.groupby(doc_col))
        .applyInPandas(enrich, schema=ENRICHED_SCHEMA)
    )
