"""LightRAG dual-level retrieval (lightrag/dual_retrieval.rs,
lightrag/keyword_extraction.rs).

The reference retrieves at two levels — high (topic/community summaries)
and low (entity/chunk) — with keywords split per level, then merges the
two ranked lists under one of four strategies (dual_retrieval.rs:57-69).

Spark shape:

* keyword extraction: the LLM path is a pluggable ``llm_fn`` slot (the
  sandbox parity anchor is the reference's own FALLBACK path,
  keyword_extraction.rs:167-188: query terms longer than 3 bytes, first
  10, lowercased, as low-level keywords) — the fallback is pure JVM
  column expressions, no UDF.
* merging: every strategy reduces to "order candidates by a draw
  position, drop duplicate ids keeping the earliest, take top-k" — two
  windows partitioned by query, fully distributed over a many-query
  candidate table. The equivalence argument per strategy is in
  ``merge_dual_results``'s docstring.
* ``dual_retrieve``: the composed single-query convenience mirroring
  DualLevelRetriever::retrieve (keywords → BM25 at both levels →
  merge), matching the repo's hybrid_search shape.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERGE_STRATEGIES = ("interleave", "high_first", "low_first", "weighted")

HIGH_LEVEL_WEIGHT = 0.6  # dual_retrieval.rs:48
LOW_LEVEL_WEIGHT = 0.4  # dual_retrieval.rs:49
MAX_KEYWORDS = 20  # keyword_extraction.rs:37


# --- keyword extraction (keyword_extraction.rs) ---------------------------


def fallback_keywords_expr(query_col: Column) -> Column:
    """keyword_extraction.rs:174-180 — words longer than 3 BYTES
    (Rust ``str::len``), first 10, lowercased. Pure JVM;
    ``octet_length`` keeps the byte semantics so non-ASCII words (e.g. a
    2-char CJK term = 6 bytes) pass exactly as in the reference and in
    :func:`fallback_low_keywords`."""
    words = F.filter(F.split(F.trim(query_col), r"\s+"),
                     lambda w: F.octet_length(w) > 3)
    return F.transform(F.slice(words, 1, 10), F.lower)


def fallback_low_keywords(query: str) -> list[str]:
    """Python twin of :func:`fallback_keywords_expr`'s low-level list —
    the single definition both per-row fallback sites use."""
    return [w.lower() for w in (query or "").split()
            if len(w.encode()) > 3][:10]


def extract_json(response: str) -> str | None:
    """keyword_extraction.rs:126-146 — first ``{`` to last ``}``."""
    start = response.find("{")
    end = response.rfind("}")
    if start >= 0 and end >= start:
        return response[start:end + 1]
    if response.strip().startswith("{"):
        return response.strip()
    return None


def parse_keywords_response(response: str,
                            max_keywords: int = MAX_KEYWORDS) -> dict | None:
    """keyword_extraction.rs:112-165 — JSON parse + count validation.
    Returns ``{"high_level": [...], "low_level": [...]}`` or None when
    the response fails any gate (the caller then takes the fallback)."""
    raw = extract_json(response)
    if raw is None:
        return None
    try:
        obj = json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        return None
    high = obj.get("high_level")
    low = obj.get("low_level")
    if not isinstance(high, list) or not isinstance(low, list):
        return None
    if not all(isinstance(x, str) for x in high + low):
        return None
    total = len(high) + len(low)
    if total == 0 or total > max_keywords:
        return None
    return {"high_level": high, "low_level": low}


def extract_dual_keywords(
    queries: DataFrame,
    query_col: str = "query",
    llm_fn=None,
    max_keywords: int = MAX_KEYWORDS,
) -> DataFrame:
    """Adds ``high_level`` / ``low_level`` keyword arrays per query.

    Without ``llm_fn`` (the sandbox default) every query takes the
    reference's fallback path: empty high level, filtered query terms
    low level (keyword_extraction.rs:182-185). With ``llm_fn`` —
    ``(prompt: str) -> str`` — responses are parsed/validated per
    keyword_extraction.rs:112-165 inside an Arrow batch, falling back
    per-query on any parse/validation failure, exactly like
    extract_with_fallback.
    """
    if llm_fn is None:
        return queries.withColumn(
            "high_level", F.array().cast("array<string>")
        ).withColumn("low_level", fallback_keywords_expr(F.col(query_col)))

    from collections.abc import Iterator

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            highs, lows = [], []
            for q in pdf[query_col]:
                parsed = None
                try:
                    parsed = parse_keywords_response(
                        llm_fn(q or ""), max_keywords)
                except Exception:
                    parsed = None
                if parsed is None:
                    highs.append([])
                    lows.append(fallback_low_keywords(q))
                else:
                    highs.append(parsed["high_level"])
                    lows.append(parsed["low_level"])
            pdf = pdf.copy()
            pdf["high_level"] = highs
            pdf["low_level"] = lows
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in queries.schema
    ) + ", high_level array<string>, low_level array<string>"
    return queries.mapInPandas(run, schema=schema)


# --- merge strategies (dual_retrieval.rs:197-324) -------------------------


def merge_dual_results(
    high: DataFrame,
    low: DataFrame,
    strategy: str = "interleave",
    top_k: int = 10,
    query_col: str = "query",
    id_col: str = "id",
    score_col: str = "score",
    rank_col: str = "rank",
    high_weight: float = HIGH_LEVEL_WEIGHT,
    low_weight: float = LOW_LEVEL_WEIGHT,
) -> DataFrame:
    """Merge two per-query ranked candidate tables.

    Each strategy is the reference loop re-expressed as a deterministic
    draw position, so dedupe-keep-earliest + take-k reproduces it:

    * ``interleave`` (rs:212-250): the loop draws high's i-th element at
      global position 2i and low's i-th at 2i+1 regardless of skips, so
      position = 2·rank + side (high=0). A duplicate consumes its draw
      slot and contributes nothing — identical to dropping it from the
      position-ordered stream.
    * ``high_first`` / ``low_first`` (rs:253-283): position = (side,
      rank) lexicographic.
    * ``weighted`` (rs:286-324): score·weight descending; Rust's stable
      sort keeps insertion order (all high rows precede low) on ties, so
      the tiebreak is (side, rank).

    Output: one row per kept candidate with ``merged_rank`` (1-based).
    """
    if strategy not in MERGE_STRATEGIES:
        raise ValueError(f"unknown merge strategy: {strategy!r}")

    cols = [query_col, id_col, score_col, rank_col]
    h = high.select(*cols).withColumn("_side", F.lit(0))
    l = low.select(*cols).withColumn("_side", F.lit(1))
    both = h.unionByName(l)

    r = F.col(rank_col).cast("long")
    if strategy == "interleave":
        pos = [(r * 2 + F.col("_side")).asc()]
    elif strategy == "high_first":
        pos = [F.col("_side").asc(), r.asc()]
    elif strategy == "low_first":
        pos = [F.col("_side").desc(), r.asc()]
    else:
        both = both.withColumn(
            "weighted_score",
            F.col(score_col).cast("double")
            * F.when(F.col("_side") == 0, F.lit(float(high_weight)))
            .otherwise(F.lit(float(low_weight))),
        )
        pos = [F.col("weighted_score").desc(), F.col("_side").asc(), r.asc()]

    first_seen = Window.partitionBy(query_col, id_col).orderBy(*pos)
    deduped = (
        both.withColumn("_dup", F.row_number().over(first_seen))
        .where(F.col("_dup") == 1)
        .drop("_dup")
    )
    final = Window.partitionBy(query_col).orderBy(*pos)
    return (
        deduped.withColumn("merged_rank", F.row_number().over(final))
        .where(F.col("merged_rank") <= top_k)
        .withColumn("source_level",
                    F.when(F.col("_side") == 0, F.lit("high"))
                    .otherwise(F.lit("low")))
        .drop("_side")
    )


# --- composed retrieval (DualLevelRetriever::retrieve) --------------------


def dual_retrieve(
    high_docs: DataFrame,
    low_docs: DataFrame,
    query: str,
    top_k: int = 10,
    strategy: str = "interleave",
    id_col: str = "doc_id",
    text_col: str = "text",
    llm_fn=None,
) -> DataFrame:
    """dual_retrieval.rs:103-146 single-query composition: dual-level
    keywords (fallback path unless ``llm_fn``) → BM25 over the topic
    corpus with the high-level keyword string and over the entity/chunk
    corpus with the low-level string (keywords joined by spaces,
    rs:160,184; an empty keyword level contributes no candidates,
    rs:154-157) → strategy merge."""
    from graphrag_rs_spark.operators.retrieval import bm25_scores

    if llm_fn is not None:
        parsed = None
        try:
            parsed = parse_keywords_response(llm_fn(query))
        except Exception:
            parsed = None
    else:
        parsed = None
    if parsed is None:
        kw = {
            "high_level": [],
            "low_level": fallback_low_keywords(query),
        }
    else:
        kw = parsed

    spark = high_docs.sparkSession
    empty = spark.createDataFrame(
        [], f"query string, id string, score double, rank long")

    def level(docs: DataFrame, words: list[str]) -> DataFrame:
        if not words:
            return empty
        combined = " ".join(words)
        ranked = bm25_scores(docs, combined, id_col=id_col,
                             text_col=text_col, limit=top_k).select(
            F.lit(query).alias("query"),
            F.col(id_col).cast("string").alias("id"),
            F.col("score").cast("double").alias("score"),
        )
        w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
        return ranked.withColumn("rank", F.row_number().over(w).cast("long"))

    return merge_dual_results(
        level(high_docs, kw["high_level"]),
        level(low_docs, kw["low_level"]),
        strategy=strategy,
        top_k=top_k,
    )
