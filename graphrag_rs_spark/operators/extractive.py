"""Extractive summarization over a document table.

Spark-first port of the reference's standalone sentence-ranking
summarizer (text/extractive_summarizer.rs:9-357; rule twin in
rules/extractive.py). Every document is summarized independently — the
sentence-frequency corpus is the document's OWN sentences, never a
cross-document aggregate — so the distributed shape is a shuffle-free
Arrow-batched ``mapInPandas``: no groupBy, no join, no window. At 100 TB
this is a single narrow stage that scales linearly with input splits;
the only sizing concern is Arrow batch memory, bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × document size,
identical to the extraction stage's envelope.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUMMARY_SCHEMA = (
    "doc_id string, summary string, n_sentences int, n_selected int"
)


def extractive_summaries(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_length: int | None = 200,
    num_sentences: int | None = None,
) -> DataFrame:
    """Summarize each row's ``text_col`` independently.

    Exactly one of ``max_length`` (character-budget mode,
    extractive_summarizer.rs:30-68) or ``num_sentences`` (top-N mode,
    extractive_summarizer.rs:317-357) drives selection; passing both
    raises. Output: ``(doc_id, summary, n_sentences, n_selected)`` where
    ``n_sentences`` counts the split sentences and ``n_selected`` the
    sentences kept (0 for empty input).
    """
    if (max_length is None) == (num_sentences is None):
        raise ValueError(
            "pass exactly one of max_length / num_sentences")
    mode_max, mode_n = max_length, num_sentences

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.extractive import (
            split_sentences,
            summarize,
            summarize_sentences,
        )

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                text = text or ""
                sentences = split_sentences(text)
                if mode_max is not None:
                    summary = summarize(text, mode_max)
                else:
                    summary = summarize_sentences(text, mode_n)
                n_selected = len(split_sentences(summary)) if summary else 0
                rows.append((doc_id, summary, len(sentences), n_selected))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "summary", "n_sentences", "n_selected"],
            )

    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).mapInPandas(run, schema=SUMMARY_SCHEMA)
