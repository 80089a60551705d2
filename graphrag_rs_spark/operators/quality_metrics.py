"""ROGRAG quality metrics over a response table
(rograg/quality_metrics.rs; rule twins in rules/quality_metrics.py).

The reference scores one response at a time inside a stateful monitor.
Spark-first, the same math becomes three batch operators over a
``responses`` DataFrame with columns ``(query, content, confidence,
sources array<string>, subquery_types array<string>,
processing_time_ms, decomposition_success, fallback_used)``:

* ``score_responses`` — the five quality scores + overall + retrieval
  strategy, ENTIRELY in JVM column expressions (splits, array set ops,
  when-ladders; no UDF, one narrow stage at any scale).
* ``aggregate_quality`` — AggregatedMetrics (quality_metrics.rs:
  1266-1299): means, success rate, population std-dev of overall
  quality, in one hash aggregation.
* ``comparative_analysis`` — ComparativeAnalysis (rs:1224-1336): two
  aggregations + driver-side scalar improvement percentages and the
  reference's heuristic significance estimate.
* ``quality_alerts`` — the threshold checks of check_quality_alerts
  (rs:1191-1222) as a filter + union, minus the wall-clock parts
  (alert retention windows are the caller's stream concern; at scale
  this runs inside foreachBatch on micro-batches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.rules.quality_metrics import (
    DEFAULT_MAX_PROCESSING_MS,
    DEFAULT_MIN_QUALITY,
    TRANSITION_WORDS,
)

QUALITY_COLS = (
    "accuracy_score", "completeness_score", "coherence_score",
    "relevance_score", "source_credibility", "overall_quality",
)


from graphrag_rs_spark.functions import ws_tokens as _ws_split


def _coherence_expr(content: Column) -> Column:
    """quality_metrics.rs:1034-1064. ``split(['.','!','?'])`` keeps
    empty pieces, so the JVM twin splits on the class WITHOUT trimming
    or filtering; a no-terminator text yields 1 piece → 1.0."""
    sentences = F.split(content, r"[.!?]", -1)
    n_sent = F.size(sentences)
    transition_count = F.size(
        F.filter(F.transform(sentences, F.lower), _contains_any)
    )
    transition_score = F.least(
        transition_count.cast("double") / n_sent, F.lit(1.0))
    words = F.split(F.trim(content), r"\s+")
    words = F.filter(words, lambda t: t != "")
    repetition = F.when(
        F.size(words) == 0, F.lit(1.0)
    ).otherwise(
        F.size(F.array_distinct(words)).cast("double") / F.size(words)
    )
    return F.when(n_sent <= 1, F.lit(1.0)).otherwise(
        (transition_score + repetition) / 2.0
    )


def _contains_any(sentence_lower: Column) -> Column:
    cond = None
    for t in TRANSITION_WORDS:
        c = sentence_lower.contains(t)
        cond = c if cond is None else (cond | c)
    return cond


def score_responses(
    responses: DataFrame,
    query_col: str = "query",
    content_col: str = "content",
    confidence_col: str = "confidence",
    sources_col: str = "sources",
    subquery_types_col: str = "subquery_types",
) -> DataFrame:
    """quality_metrics.rs:986-1129 as one narrow JVM stage."""
    content = F.col(content_col)
    sources = F.coalesce(
        F.col(sources_col), F.array().cast("array<string>"))
    n_sources = F.size(sources)
    subq = F.coalesce(
        F.col(subquery_types_col), F.array().cast("array<string>"))

    # source credibility (rs:1088-1104) — first-5-CHAR prefix diversity
    prefixes = F.array_distinct(
        F.transform(sources, lambda s: F.substring(s, 1, 5)))
    cred = F.when(n_sources == 0, F.lit(0.0)).otherwise(
        (
            F.least(n_sources.cast("double") / 5.0, F.lit(1.0))
            + F.size(prefixes).cast("double") / n_sources
        ) / 2.0
    )

    accuracy = (F.col(confidence_col).cast("double") + cred) / 2.0

    # completeness (rs:1020-1032) — octet_length = Rust content.len()
    completeness = (
        F.least(F.octet_length(content).cast("double") / 500.0, F.lit(1.0))
        + F.least(n_sources.cast("double") / 3.0, F.lit(1.0))
        + F.least(F.size(subq).cast("double") / 5.0, F.lit(1.0))
    ) / 3.0

    coherence = _coherence_expr(content)

    # relevance (rs:1066-1086)
    qwords = F.array_distinct(
        F.filter(_ws_split(F.lower(F.col(query_col))),
                 lambda w: F.octet_length(w) > 3))
    awords = F.array_distinct(_ws_split(F.lower(content)))
    relevance = F.when(F.size(qwords) == 0, F.lit(1.0)).otherwise(
        F.size(F.array_intersect(qwords, awords)).cast("double")
        / F.size(qwords)
    )

    # barrier: each sub-score is referenced both as its own output column
    # and inside overall_quality; compute_once stops CollapseProject from
    # inlining the split/transform trees into every reference
    from graphrag_rs_spark.functions import compute_once

    responses = compute_once(
        responses,
        {
            "source_credibility": cred,
            "accuracy_score": accuracy,
            "completeness_score": completeness,
            "coherence_score": coherence,
            "relevance_score": relevance,
        },
    )
    cred = F.col("source_credibility")
    accuracy = F.col("accuracy_score")
    completeness = F.col("completeness_score")
    coherence = F.col("coherence_score")
    relevance = F.col("relevance_score")

    overall = F.least(
        accuracy * 0.3 + completeness * 0.25 + coherence * 0.2
        + relevance * 0.15 + cred * 0.1,
        F.lit(1.0),
    )

    # retrieval strategy (rs:1106-1129)
    n_lf = F.size(F.filter(subq, lambda t: t == "logic_form"))
    n_fm = F.size(F.filter(subq, lambda t: t == "fuzzy_match"))
    n_fb = F.size(F.filter(subq, lambda t: t == "fallback"))
    strategy = (
        F.when(n_fb > 0, F.lit("fallback"))
        .when((n_lf > 0) & (n_fm > 0), F.lit("hybrid"))
        .when(n_lf > 0, F.lit("logic_form"))
        .otherwise(F.lit("fuzzy_match"))
    )

    return (
        responses.withColumn("overall_quality", overall)
        .withColumn("retrieval_strategy", strategy)
    )


def aggregate_quality(scored: DataFrame,
                      time_col: str = "processing_time_ms",
                      success_col: str = "decomposition_success"
                      ) -> DataFrame:
    """quality_metrics.rs:1266-1299 — one row of AggregatedMetrics.
    ``var_pop`` matches the reference's /n variance."""
    return scored.agg(
        F.avg("accuracy_score").alias("mean_accuracy"),
        F.avg("completeness_score").alias("mean_completeness"),
        F.avg("coherence_score").alias("mean_coherence"),
        F.avg("relevance_score").alias("mean_relevance"),
        F.avg(F.col(time_col).cast("double")).alias(
            "mean_processing_time_ms"),
        F.avg(F.col(success_col).cast("int").cast("double")).alias(
            "success_rate"),
        F.sqrt(F.var_pop("overall_quality")).alias("std_dev_quality"),
        F.count(F.lit(1)).alias("n"),
    )


def comparative_analysis(rograg_scored: DataFrame,
                         baseline_scored: DataFrame) -> dict:
    """quality_metrics.rs:1224-1336 — aggregate both sides (two small
    agg jobs → two driver rows), then scalar improvements + the
    reference's heuristic significance."""
    from graphrag_rs_spark.rules.quality_metrics import (
        improvement_percentage,
        statistical_significance,
    )

    ro = aggregate_quality(rograg_scored).collect()[0].asDict()
    ba = aggregate_quality(baseline_scored).collect()[0].asDict()
    improvements = {
        "accuracy_improvement": improvement_percentage(
            ro["mean_accuracy"], ba["mean_accuracy"]),
        "completeness_improvement": improvement_percentage(
            ro["mean_completeness"], ba["mean_completeness"]),
        "coherence_improvement": improvement_percentage(
            ro["mean_coherence"], ba["mean_coherence"]),
        "processing_time_change": improvement_percentage(
            ro["mean_processing_time_ms"], ba["mean_processing_time_ms"]),
        "success_rate_improvement": improvement_percentage(
            ro["success_rate"], ba["success_rate"]),
    }
    return {
        "rograg_metrics": ro,
        "baseline_metrics": ba,
        "improvement_percentages": improvements,
        "statistical_significance": statistical_significance(ro, ba),
    }


def quality_alerts(
    scored: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    max_processing_ms: int = DEFAULT_MAX_PROCESSING_MS,
    time_col: str = "processing_time_ms",
    query_col: str = "query",
) -> DataFrame:
    """check_quality_alerts (rs:1191-1222) batch-shaped: one alert row
    per breach, severity/type/message matching the reference."""
    low_q = scored.where(
        F.col("overall_quality") < F.lit(float(min_quality))
    ).select(
        F.col(query_col).alias("query"),
        F.lit("quality_degradation").alias("alert_type"),
        F.lit("high").alias("severity"),
        F.format_string("Low quality response: %.2f",
                        F.col("overall_quality")).alias("message"),
        F.col("overall_quality").cast("double").alias("metric_value"),
        F.lit(float(min_quality)).alias("threshold"),
    )
    slow = scored.where(
        F.col(time_col).cast("double") > F.lit(float(max_processing_ms))
    ).select(
        F.col(query_col).alias("query"),
        F.lit("performance_degradation").alias("alert_type"),
        F.lit("medium").alias("severity"),
        F.format_string("Slow processing: %dms",
                        F.col(time_col).cast("long")).alias("message"),
        F.col(time_col).cast("double").alias("metric_value"),
        F.lit(float(max_processing_ms)).alias("threshold"),
    )
    return low_q.unionByName(slow)
