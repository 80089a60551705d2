"""Custom rule-based NER as a distributed operator
(graphrag-rs nlp/custom_ner.rs:68-380 semantics; rules/ner.py is the
shared pure-Python rule engine).

The rule table is tiny config data: it is closed over by the Arrow-batched
``mapInPandas`` function, so Spark ships it once per task via the
serialized closure (the moral equivalent of a broadcast variable for
sub-kilobyte configs). The scan itself is narrow — no shuffle; output is
one mention row per surviving match.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame

from graphrag_rs_spark.rules.ner import ExtractionRule

NER_SCHEMA = (
    "chunk_id string, text string, entity_type string, start int, end int, "
    "confidence float, rule_name string"
)


def extract_with_rules(
    chunks: DataFrame,
    rules: Sequence[ExtractionRule],
    text_col: str = "text",
    id_col: str = "chunk_id",
) -> DataFrame:
    """chunks → (chunk_id, text, entity_type, start, end, confidence,
    rule_name) mention rows after priority ordering + overlap resolution."""
    rule_list = list(rules)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.ner import extract

        for pdf in batches:
            out = []
            for cid, text in zip(pdf[id_col], pdf[text_col]):
                for ent in extract(text or "", rule_list):
                    out.append(
                        (
                            cid,
                            ent.text,
                            ent.entity_type,
                            ent.start,
                            ent.end,
                            ent.confidence,
                            ent.rule_name,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "chunk_id", "text", "entity_type", "start", "end",
                    "confidence", "rule_name",
                ],
            )

    return chunks.select(id_col, text_col).mapInPandas(run, schema=NER_SCHEMA)
