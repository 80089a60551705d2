"""Query-intelligence operators: rerank, adaptive routing, rewriting.

Spark-first re-expressions of three deterministic query-side modules of
the reference (rule twins in rules/query_intelligence.py):

* ``rerank_cross_encoder`` — reranking/cross_encoder.rs:148-196
  (ConfidenceCrossEncoder::rerank). The reference reranks ONE query's
  candidate list in memory; here a ``(query, id, content, score)``
  DataFrame of MANY queries' candidates is reranked in one pass, with
  the relevance formula (token-Jaccard·0.7 + capped-length·0.3 →
  sigmoid) computed ENTIRELY in JVM expressions — split/array_distinct/
  array_intersect + codegen math, no Python in the hot path — and the
  per-query sort + top-k as a window. At 100 TB the candidate table is
  the big side and stays partitioned; nothing is collected.
* ``reranking_stats`` — cross_encoder.rs:214-266 (RerankingStats):
  per-query aggregates of the reranked output vs the candidate count.
* ``route_queries`` — query/adaptive_routing.rs:104-200: keyword /
  length / entity-indicator scores and the five-way complexity class as
  a pure column-expression ``when`` ladder (27 ``contains`` probes fold
  into whole-stage codegen; no UDF at all).
* ``rewrite_queries`` — query/intelligence.rs:92-118: template rewrite +
  in-order synonym expansion is order-sensitive list manipulation, so it
  runs as an Arrow-batched ``mapInPandas`` over the rule twin (cheap,
  per-query-row, no graph access — the same shape as rograg.py).

Scores are f64 (reference: f32); pinned vectors keep margins from the
class thresholds so the widened precision cannot flip a class.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphrag_rs_spark.rules.query_intelligence import (
    BROAD_KEYWORDS,
    SPECIFIC_KEYWORDS,
)

# --- Cross-encoder rerank -------------------------------------------------


from graphrag_rs_spark.functions import ws_tokens as _ws_tokens


def relevance_expr(query_col: Column, doc_col: Column,
                   normalize: bool = True) -> Column:
    """cross_encoder.rs:104-144 as one JVM expression.

    Jaccard over DISTINCT case-sensitive tokens, length factor over the
    raw (non-distinct) document token count; empty side → 0.0 raw,
    bypassing the sigmoid exactly like the reference's early return.
    """
    q = F.array_distinct(_ws_tokens(query_col))
    d_raw = _ws_tokens(doc_col)
    d = F.array_distinct(d_raw)
    inter = F.size(F.array_intersect(q, d)).cast("double")
    union = F.size(q) + F.size(d) - inter
    jaccard = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    length_factor = F.least(F.size(d_raw) / F.lit(100.0), F.lit(1.0))
    raw = jaccard * 0.7 + length_factor * 0.3
    scored = (
        F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-5.0) * (raw - 0.5)))
        if normalize
        else raw
    )
    return F.when(
        (F.size(q) == 0) | (F.size(d_raw) == 0), F.lit(0.0)
    ).otherwise(scored)


def rerank_cross_encoder(
    candidates: DataFrame,
    query_col: str = "query",
    content_col: str = "content",
    score_col: str = "score",
    top_k: int = 10,
    min_confidence: float = 0.0,
    normalize_scores: bool = True,
) -> DataFrame:
    """cross_encoder.rs:148-196 over a many-query candidate DataFrame.

    Emits the input columns plus ``relevance_score`` / ``original_score``
    / ``score_delta`` / ``rank``, keeping per query the top-``top_k``
    rows at or above ``min_confidence``, ordered by relevance descending.
    Ties keep the reference's stable sort order (first-seen first) via
    the candidate's original per-query position when an ``_ord`` column
    exists, else content as the deterministic tiebreak.
    """
    rel = relevance_expr(F.col(query_col), F.col(content_col),
                         normalize=normalize_scores)
    # barrier: relevance_score is referenced by score_delta, the filter,
    # and the window order — without it the token-Jaccard splits inline
    # into each reference (measured split() x26 in the optimized plan)
    from graphrag_rs_spark.functions import compute_once

    out = (
        compute_once(candidates, {"relevance_score": rel})
        .withColumn("original_score",
                    F.col(score_col).cast("double"))
        .withColumn("score_delta",
                    F.col("relevance_score") - F.col("original_score"))
        .where(F.col("relevance_score") >= F.lit(float(min_confidence)))
    )
    tiebreak = (
        F.col("_ord").asc() if "_ord" in candidates.columns
        else F.col(content_col).asc()
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("relevance_score").desc(), tiebreak
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def reranking_stats(candidates: DataFrame, reranked: DataFrame,
                    query_col: str = "query") -> DataFrame:
    """cross_encoder.rs:214-266 (RerankingStats::from_results), one row
    per query: candidate/result counts, mean/max score delta, filter %."""
    cand = candidates.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("candidates_count"))
    res = reranked.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("results_count"),
        F.avg("score_delta").alias("avg_score_improvement"),
        F.max("score_delta").alias("max_score_improvement"),
    )
    return (
        cand.join(res, query_col, "left")
        .fillna({"results_count": 0, "avg_score_improvement": 0.0,
                 "max_score_improvement": 0.0})
        .withColumn(
            "filter_rate",
            F.when(
                F.col("candidates_count") > 0,
                (F.col("candidates_count") - F.col("results_count"))
                * 100.0 / F.col("candidates_count"),
            ).otherwise(F.lit(0.0)),
        )
    )


# --- Adaptive routing -----------------------------------------------------


def _count_occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping substring count (rust ``str::matches().count()``)
    via the length-difference identity — stays in codegen."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def route_queries(
    queries: DataFrame,
    query_col: str = "query",
    max_level: int = 3,
    keyword_weight: float = 0.5,
    length_weight: float = 0.3,
    entity_weight: float = 0.2,
) -> DataFrame:
    """adaptive_routing.rs:104-200 as pure column expressions.

    Adds ``keyword_score`` / ``length_score`` / ``entity_score`` /
    ``total_score`` / ``complexity`` / ``suggested_level``. All 26
    keyword probes are ``contains`` over the lowercased query — constant
    folded into one codegen stage, no shuffle, no UDF.
    """
    ql = F.lower(F.col(query_col))

    broad_hits = sum(
        (ql.contains(k)).cast("int") for k in BROAD_KEYWORDS
    )
    spec_hits = sum(
        (ql.contains(k)).cast("int") for k in SPECIFIC_KEYWORDS
    )
    matches = broad_hits + spec_hits
    kw = F.when(
        matches > 0,
        (broad_hits - spec_hits).cast("double") / matches
    ).otherwise(F.lit(0.0))

    n_words = F.size(_ws_tokens(F.col(query_col)))
    ln = (
        F.when((n_words >= 1) & (n_words <= 3), F.lit(0.5))
        .when((n_words >= 4) & (n_words <= 5), F.lit(0.2))
        .when((n_words >= 6) & (n_words <= 7), F.lit(0.0))
        .when((n_words >= 8) & (n_words <= 10), F.lit(-0.3))
        .otherwise(F.lit(-0.5))
    )

    indicators = (
        (_count_occurrences(ql, '"') / 2).cast("int")
        + _count_occurrences(ql, " and ")
        + _count_occurrences(ql, "between")
    )
    en = (
        F.when(indicators == 0, F.lit(0.3))
        .when(indicators == 1, F.lit(0.0))
        .when(indicators == 2, F.lit(-0.4))
        .otherwise(F.lit(-0.7))
    )

    # The three scores feed total -> complexity -> level, each referenced
    # several times; without a barrier CollapseProject inlines the 26
    # contains probes ~20x (measured: lower() x1728 in the optimized
    # plan). compute_once evaluates them one time per row.
    from graphrag_rs_spark.functions import compute_once

    queries = compute_once(
        queries, {"keyword_score": kw, "length_score": ln, "entity_score": en}
    )
    kw, ln, en = (
        F.col("keyword_score"), F.col("length_score"), F.col("entity_score")
    )
    total = (kw * keyword_weight + ln * length_weight + en * entity_weight)

    complexity = (
        F.when(total >= 0.7, F.lit("very_broad"))
        .when(total >= 0.4, F.lit("broad"))
        .when(total >= -0.2, F.lit("medium"))
        .when(total >= -0.5, F.lit("specific"))
        .otherwise(F.lit("very_specific"))
    )
    level = (
        # adaptive_routing.rs:63-73 (QueryComplexity::to_level)
        F.when(complexity == "very_broad", F.lit(max(max_level, 2)))
        .when(complexity == "broad", F.lit(max(max_level - 1, 1)))
        .when(complexity == "medium", F.lit(1))
        .otherwise(F.lit(0))
    )

    return (
        queries.withColumn("total_score", total)
        .withColumn("complexity", complexity)
        .withColumn("suggested_level", level)
    )


# --- Query rewriting ------------------------------------------------------

REWRITE_SCHEMA = (
    "query string, rewritten string, query_type string, "
    "expanded_terms array<string>, confidence double"
)


def rewrite_queries(queries: DataFrame, query_col: str = "query",
                    synonyms: dict[str, list[str]] | None = None,
                    feedback: dict[str, float] | None = None) -> DataFrame:
    """intelligence.rs:92-118 batched: one Arrow pass over the rule twin
    (template replace + in-order synonym expansion are order-sensitive
    list ops — not worth contorting into array expressions). ``synonyms``
    extends the reference defaults; ``feedback`` pre-seeds relevance
    scores (record_feedback applied once per entry)."""
    extra_syn = dict(synonyms or {})
    extra_fb = dict(feedback or {})

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.query_intelligence import (
            QueryIntelligence,
        )

        engine = QueryIntelligence()
        for term, syns in extra_syn.items():
            engine.add_synonym(term, syns)
        for term, score in extra_fb.items():
            engine.record_feedback(term, score)

        for pdf in batches:
            rows = []
            for q in pdf[query_col]:
                r = engine.rewrite_query(q or "")
                rows.append((q, r["rewritten"], r["query_type"],
                             r["expanded_terms"], float(r["confidence"])))
            yield pd.DataFrame(
                rows,
                columns=["query", "rewritten", "query_type",
                         "expanded_terms", "confidence"],
            )

    return queries.select(F.col(query_col).alias("query")).mapInPandas(
        run, schema=REWRITE_SCHEMA
    )
