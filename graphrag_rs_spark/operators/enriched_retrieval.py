"""Enriched metadata-aware retrieval (retrieval/enriched.rs; rule twins
in rules/enriched.py).

Operates on the ENRICHED chunk table produced by
``operators/enrichment.enrich_chunks`` — ``(chunk_id, chapter, section,
subsection, keywords array<string>, summary, meta_confidence, ...)``
optionally joined with chunk text. The reference walks every chunk of an
in-memory graph per query; here each operator is one narrow JVM stage
over the chunk-metadata table (the query is a driver-side literal:
words/structure references are extracted once in Python and folded into
the plan as constants — no UDF, no shuffle except the optional
base-score broadcast join).

``meta_confidence`` doubles as the reference's
``ChunkMetadata::completeness_score()`` — both are the same 9-slot
ratio (core/metadata.rs:166-199; rules/layout.py chunk_metadata).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.rules.enriched import (
    BOOST_GATE,
    COMPLETENESS_BONUS,
    KEYWORD_MATCH_WEIGHT,
    MIN_KEYWORD_MATCHES,
    STRUCTURE_MATCH_WEIGHT,
    SUMMARY_WEIGHT,
    extract_structure_references,
    query_words,
)


def _qwords_lit(query: str) -> tuple[list[str], int]:
    qw = sorted(query_words(query))
    return qw, max(len(qw), 1)


def _keyword_matches_expr(keywords_col: Column, qw: list[str]) -> Column:
    kws = F.coalesce(keywords_col, F.array().cast("array<string>"))
    if not qw:
        return F.lit(0)
    return F.size(F.filter(kws, lambda k: F.lower(k).isin(qw)))


def _structure_boost_expr(refs: list[str]) -> Column:
    """Sum of 0.5/0.3/0.2 per matching reference (enriched.rs:340-378)."""
    boost = F.lit(0.0)
    for ref in refs:
        rl = ref.lower()
        boost = boost + (
            F.when(F.lower(F.coalesce(F.col("chapter"), F.lit("")))
                   .contains(rl), F.lit(0.5)).otherwise(F.lit(0.0))
            + F.when(F.lower(F.coalesce(F.col("section"), F.lit("")))
                     .contains(rl), F.lit(0.3)).otherwise(F.lit(0.0))
            + F.when(F.lower(F.coalesce(F.col("subsection"), F.lit("")))
                     .contains(rl), F.lit(0.2)).otherwise(F.lit(0.0))
        )
    return boost


def _matches_query_expr(text_col: Column, qw: list[str]) -> Column:
    """enriched.rs:381-388 as a constant-folded hit count."""
    if not qw:
        return F.lit(False)  # 0 hits < max(0/2,1)=1, like the twin
    tl = F.lower(F.coalesce(text_col, F.lit("")))
    hits = sum(F.when(tl.contains(w), 1).otherwise(0) for w in qw)
    need = max(len(qw) // 2, 1)
    return hits >= F.lit(need)


def metadata_search(
    enriched: DataFrame,
    query: str,
    base_results: DataFrame | None = None,
    min_keyword_matches: int = MIN_KEYWORD_MATCHES,
    enable_structure_filtering: bool = True,
) -> DataFrame:
    """enriched.rs:62-140 — metadata-boosted chunk scoring.

    ``base_results`` (chunk_id, score) supplies prior scores (default
    0.5, rs:376-378) via a broadcast left join. Keeps chunks whose
    metadata boost clears 0.05, with ``score = min(base + boost, 1)``.
    Chunks qualify when they carry keywords (the reference also admits
    entity-bearing chunks; pass a pre-filtered frame to widen).
    """
    qw, qdenom = _qwords_lit(query)
    refs = extract_structure_references(query.lower())

    matches = _keyword_matches_expr(F.col("keywords"), qw)
    kw_boost = F.when(
        matches >= F.lit(int(min_keyword_matches)),
        matches.cast("double") / qdenom * KEYWORD_MATCH_WEIGHT,
    ).otherwise(F.lit(0.0))

    boost = kw_boost
    if enable_structure_filtering and refs:
        sb = _structure_boost_expr(refs)
        boost = boost + F.when(sb > 0, sb * STRUCTURE_MATCH_WEIGHT
                               ).otherwise(F.lit(0.0))
    if qw:
        boost = boost + F.when(
            F.col("summary").isNotNull()
            & _matches_query_expr(F.col("summary"), qw),
            F.lit(SUMMARY_WEIGHT),
        ).otherwise(F.lit(0.0))
    boost = boost + F.when(
        F.col("meta_confidence") > 0.7, F.lit(COMPLETENESS_BONUS)
    ).otherwise(F.lit(0.0))

    out = enriched.where(
        F.size(F.coalesce(F.col("keywords"),
                          F.array().cast("array<string>"))) > 0
    ).withColumn("metadata_boost", boost)

    if base_results is not None:
        out = out.join(
            F.broadcast(base_results.select(
                "chunk_id", F.col("score").alias("_base"))),
            "chunk_id", "left",
        )
    else:
        out = out.withColumn("_base", F.lit(None).cast("double"))

    return (
        out.where(F.col("metadata_boost") > F.lit(BOOST_GATE))
        .withColumn(
            "score",
            F.least(F.coalesce(F.col("_base"), F.lit(0.5))
                    + F.col("metadata_boost"), F.lit(1.0)),
        )
        .drop("_base")
    )


def filter_by_structure(results: DataFrame, enriched: DataFrame,
                        query: str) -> DataFrame:
    """enriched.rs:146-172 — keep results whose chunk metadata matches a
    structure reference; no references → passthrough; results without
    metadata are kept (the reference's ``true`` default)."""
    refs = extract_structure_references(query.lower())
    if not refs:
        return results
    meta = enriched.select("chunk_id", "chapter", "section", "subsection")
    joined = results.join(F.broadcast(meta), "chunk_id", "left")
    match = F.lit(False)
    for ref in refs:
        rl = ref.lower()
        for col in ("chapter", "section", "subsection"):
            match = match | F.lower(
                F.coalesce(F.col(col), F.lit(""))).contains(rl)
    no_meta = (F.col("chapter").isNull() & F.col("section").isNull()
               & F.col("subsection").isNull())
    return joined.where(match | no_meta).drop(
        "chapter", "section", "subsection")


def boost_with_metadata(results: DataFrame, enriched: DataFrame,
                        query: str) -> DataFrame:
    """enriched.rs:175-219 — keyword boost (·0.2), chapter-in-query
    (+0.15), section-in-query (+0.1); capped at 1.0, re-ranked."""
    qw, qdenom = _qwords_lit(query)
    ql = query.lower()
    meta = enriched.select("chunk_id", "chapter", "section", "keywords")
    joined = results.join(F.broadcast(meta), "chunk_id", "left")

    matches = _keyword_matches_expr(F.col("keywords"), qw)
    score = F.col("score").cast("double")
    score = F.when(
        matches > 0,
        F.least(score + matches.cast("double") / qdenom * 0.2, F.lit(1.0)),
    ).otherwise(score)
    # rust checks query.contains(chapter) — the METADATA value inside
    # the query string
    chap_in_q = F.col("chapter").isNotNull() & F.lit(ql).contains(
        F.lower(F.col("chapter")))
    score = F.when(chap_in_q, F.least(score + 0.15, F.lit(1.0))
                   ).otherwise(score)
    sec_in_q = F.col("section").isNotNull() & F.lit(ql).contains(
        F.lower(F.col("section")))
    score = F.when(sec_in_q, F.least(score + 0.1, F.lit(1.0))
                   ).otherwise(score)

    return (
        joined.withColumn("score", score)
        .drop("chapter", "section", "keywords")
        .orderBy(F.col("score").desc())
    )


def chunks_in_chapter(enriched: DataFrame, chapter_name: str) -> DataFrame:
    """enriched.rs:222-233 (get_chapter_chunks)."""
    return enriched.where(
        F.col("chapter").isNotNull()
        & F.lower(F.col("chapter")).contains(chapter_name.lower()))


def chunks_in_section(enriched: DataFrame, section_name: str) -> DataFrame:
    """enriched.rs:236-247 (get_section_chunks)."""
    return enriched.where(
        F.col("section").isNotNull()
        & F.lower(F.col("section")).contains(section_name.lower()))


def search_by_keywords(enriched: DataFrame, keywords: list[str],
                       top_k: int = 10) -> DataFrame:
    """enriched.rs:250-296 — score = (matched provided keywords) /
    len(keywords); each provided keyword counts once when ANY chunk
    keyword equals it case-insensitively."""
    if not keywords:
        # same columns as the scored path (all enriched cols + score),
        # zero rows — so callers selecting metadata columns or unioning
        # across queries never hit a schema mismatch on this branch
        return enriched.where(F.lit(False)).withColumn(
            "score", F.lit(0.0))
    kws = F.coalesce(F.col("keywords"), F.array().cast("array<string>"))
    lowered = F.transform(kws, F.lower)
    hits = sum(
        F.when(F.array_contains(lowered, kw.lower()), 1).otherwise(0)
        for kw in keywords
    )
    score = hits.cast("double") / F.lit(float(len(keywords)))
    return (
        enriched.withColumn("score", score)
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("chunk_id").asc())
        .limit(top_k)
    )
