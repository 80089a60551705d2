"""NLP operators over Spark: syntax analysis + multilingual processing.

Spark surface for the reference's ``nlp/`` modules (custom NER and
semantic chunking already live in operators/ner.py and
operators/chunking.py):

* ``pos_tag_table``       — nlp/syntax_analyzer.rs:225-242, one row per
  token (doc_id, idx, text, position, pos, lemma)
* ``noun_phrases_table``  — rs:442-496, one row per phrase
* ``dependencies_table``  — rs:354-439, one row per arc
* ``detect_languages``    — nlp/multilingual.rs:232-319, one row per doc
* ``process_multilingual``— rs:393-405 (detect + normalize + tokenize)

All are Arrow-batched ``mapInPandas`` over the documents table — the
rules are per-document Python (small dictionaries, no model files), so
the operators are narrow: no shuffle, scale linearly with input splits.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POS_SCHEMA = (
    "doc_id string, idx int, token string, position int, pos string, "
    "lemma string"
)
NP_SCHEMA = (
    "doc_id string, phrase string, head_idx int, start int, n_tokens int"
)
DEP_SCHEMA = (
    "doc_id string, head int, dependent int, relation string, "
    "head_token string, dependent_token string"
)
LANG_SCHEMA = (
    "doc_id string, language string, confidence double, alternatives "
    "array<string>"
)
PROCESS_SCHEMA = (
    "doc_id string, language string, confidence double, normalized string, "
    "tokens array<string>"
)


def _with_string_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Project (id, text) with the id cast to string — the pipeline's
    doc/chunk ids are strings (chunking.py, enrichment.py, extraction.py
    all cast the same way); accepting long inputs too keeps ad-hoc
    numeric-id tables working."""
    return df.select(F.col(id_col).cast("string").alias(id_col), text_col)


def pos_tag_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.syntax import pos_tag

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for i, t in enumerate(pos_tag(text or "")):
                    rows.append((doc_id, i, t.text, t.position, t.pos, t.lemma))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "idx", "token", "position", "pos", "lemma"],
            )

    return _with_string_id(df, id_col, text_col).mapInPandas(run, schema=POS_SCHEMA)


def noun_phrases_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.syntax import extract_noun_phrases, pos_tag

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for p in extract_noun_phrases(pos_tag(text or "")):
                    rows.append(
                        (doc_id, p.text, p.head_idx, p.start, len(p.tags))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "phrase", "head_idx", "start", "n_tokens"],
            )

    return _with_string_id(df, id_col, text_col).mapInPandas(run, schema=NP_SCHEMA)


def dependencies_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.syntax import parse_dependencies, pos_tag

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                tokens = pos_tag(text or "")
                for d in parse_dependencies(tokens):
                    rows.append(
                        (
                            doc_id,
                            d.head,
                            d.dependent,
                            d.relation,
                            tokens[d.head].text,
                            tokens[d.dependent].text,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "head", "dependent", "relation",
                    "head_token", "dependent_token",
                ],
            )

    return _with_string_id(df, id_col, text_col).mapInPandas(run, schema=DEP_SCHEMA)


def detect_languages(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.multilingual import detect_language

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                d = detect_language(text or "")
                rows.append(
                    (
                        doc_id,
                        d.language,
                        float(d.confidence),
                        [lang for lang, _ in d.alternatives],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "language", "confidence", "alternatives"],
            )

    return _with_string_id(df, id_col, text_col).mapInPandas(run, schema=LANG_SCHEMA)


def process_multilingual(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.multilingual import process_text

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                p = process_text(text or "")
                rows.append(
                    (doc_id, p.language, float(p.confidence), p.normalized,
                     p.tokens)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "language", "confidence", "normalized", "tokens"
                ],
            )

    return _with_string_id(df, id_col, text_col).mapInPandas(run, schema=PROCESS_SCHEMA)
