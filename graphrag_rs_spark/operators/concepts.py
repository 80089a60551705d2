"""LazyGraphRAG-style concept graph (graphrag-rs lightrag/concept_graph.rs).

Two layers:

* ``concept_phrases`` — the regex phrase-mining half of the extractor
  (capitalized named-entity phrases + noun phrases + stopword-majority
  validity filter, concept_graph.rs:144-221) expressed **entirely in
  built-in JVM functions** (``regexp_extract_all`` + higher-order array
  ops) so it stays inside whole-stage codegen and has an exact ANSI-SQL
  oracle.
* ``chunk_concepts`` — the full extractor including the per-chunk TF
  keyword pass (concept_graph.rs:223-244), via Arrow-batched
  ``mapInPandas`` over the shared pure-Python rules
  (rules/concepts.py) — pinned to the same rules the pytest oracle runs.

Co-occurrence: concepts sharing a chunk become undirected relations with
shared-chunk count and Jaccard confidence (concept_graph.rs:389-451) —
a per-chunk self-join (pairs bounded per chunk, never a global cross
join) followed by one aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.rules.concepts import (
    CONCEPT_STOPWORDS,
    DEFAULT_MAX_WORDS,
    DEFAULT_MIN_LENGTH,
)

# Java-regex twins of rules/concepts.py patterns (concept_graph.rs:144-151)
NOUN_PHRASE_RE = r"\b[A-Z][a-z]+(?:\s+[A-Z]?[a-z]+){1,4}\b"
CAPITALIZED_RE = r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+\b"


def _valid_concept_col(phrase: Column) -> Column:
    """JVM twin of rules.concepts.is_valid_concept: length floor, word cap,
    reject majority-stopword phrases (stop > len/2 with integer division)."""
    words = F.split(phrase, r"\s+")
    stops = F.size(F.filter(words, lambda w: F.lower(w).isin(*CONCEPT_STOPWORDS)))
    return (
        (F.length(phrase) >= DEFAULT_MIN_LENGTH)
        & (F.size(words) <= DEFAULT_MAX_WORDS)
        & (stops <= F.floor(F.size(words) / 2))
    )


def concept_phrases(
    df: DataFrame, text_col: str = "text", id_col: str = "chunk_id"
) -> DataFrame:
    """(id, concept) rows: validity-filtered capitalized + noun phrases,
    distinct per id — pure Catalyst, no Python."""
    both = F.array_union(
        F.regexp_extract_all(F.col(text_col), F.lit(CAPITALIZED_RE), F.lit(0)),
        F.regexp_extract_all(F.col(text_col), F.lit(NOUN_PHRASE_RE), F.lit(0)),
    )
    kept = F.filter(both, _valid_concept_col)
    return (
        df.select(F.col(id_col), F.explode(kept).alias("concept"))
        .distinct()
    )


def chunk_concepts(
    chunks: DataFrame, text_col: str = "text", id_col: str = "chunk_id"
) -> DataFrame:
    """Full concept extraction (phrases + TF keywords) per chunk —
    (chunk_id, concept) rows, already deduped per chunk by the rules."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.concepts import extract_concepts

        for pdf in batches:
            out = []
            for cid, text in zip(pdf[id_col], pdf[text_col]):
                for c in extract_concepts(text or ""):
                    out.append((cid, c))
            yield pd.DataFrame(out, columns=[id_col, "concept"])

    return chunks.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} string, concept string"
    )


def concept_cooccurrence(
    concepts: DataFrame,
    id_col: str = "chunk_id",
    concept_col: str = "concept",
    threshold: int = 1,
) -> DataFrame:
    """(source, target, count, confidence) — pairs of concepts sharing >=
    ``threshold`` chunks; confidence = Jaccard of their chunk-id sets
    (concept_graph.rs:389-451).

    Shape: per-chunk self-join (bounded fan-out per chunk), one groupBy for
    the pair counts, one for per-concept chunk counts, two broadcast joins
    to assemble the Jaccard denominator — no all-pairs stage anywhere.
    """
    c = concepts.select(F.col(id_col).alias("cid"), F.col(concept_col).alias("concept")).distinct()
    per_concept = c.groupBy("concept").agg(F.count(F.lit(1)).alias("n_chunks"))

    a = c.select("cid", F.col("concept").alias("source"))
    b = c.select("cid", F.col("concept").alias("target"))
    pair_counts = (
        a.join(b, "cid")
        .where(F.col("source") < F.col("target"))
        .groupBy("source", "target")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= threshold)
    )
    # concept cardinality is data-dependent (can be huge at corpus scale):
    # no broadcast hint — AQE picks broadcast when the dictionary is small
    return (
        pair_counts.join(
            per_concept.select(F.col("concept").alias("source"),
                               F.col("n_chunks").alias("na")),
            "source",
        )
        .join(
            per_concept.select(F.col("concept").alias("target"),
                               F.col("n_chunks").alias("nb")),
            "target",
        )
        .select(
            "source",
            "target",
            "count",
            (
                F.col("count").cast("double")
                / (F.col("na") + F.col("nb") - F.col("count"))
            ).alias("confidence"),
        )
    )
