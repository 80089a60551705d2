"""Source / sink registry.

Covers the reference's import surface (graphrag-rs pipeline/data_import.rs:
28-114: CSV/TSV with column mappings, JSON/JSONL streaming ingest with error
tolerance, text/markdown document load lib.rs:1043-1067) plus the Iceberg
path from the north rule — gated behind a capability check since this
container has no Iceberg runtime jar (parquet is the stand-in; the call
sites are identical).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """Unified reader. Formats: parquet | iceberg | csv | tsv | json | jsonl
    | text."""
    if fmt == "iceberg":
        if iceberg_available(spark):
            return spark.read.format("iceberg").load(path)
        # graceful stand-in: identical table contract, parquet storage
        return spark.read.parquet(path)
    if fmt == "parquet":
        return spark.read.options(**options).parquet(path)
    if fmt in ("csv", "tsv"):
        # defaults merged UNDER caller options (dict merge, not duplicate
        # kwargs) so header=False / inferSchema=False / a custom sep are
        # legal overrides instead of TypeErrors
        opts = {
            "header": True,
            "inferSchema": True,
            "sep": "\t" if fmt == "tsv" else ",",
            **options,
        }
        return spark.read.options(**opts).csv(path)
    if fmt in ("json", "jsonl"):
        # JSONL is Spark's native JSON layout; PERMISSIVE mode gives the
        # reference's max_errors tolerance (data_import.rs:604-612) with
        # corrupt rows quarantined instead of counted
        opts = {
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": "_corrupt_record",
            **options,
        }
        return spark.read.options(**opts).json(path)
    if fmt == "text":
        return spark.read.options(**options).text(path)
    raise ValueError(f"unknown format: {fmt!r}")


def read_entities_csv(
    spark: SparkSession,
    path: str,
    entity_id: str = "id",
    entity_name: str = "name",
    entity_type: str = "type",
    sep: str = ",",
) -> DataFrame:
    """CSV entity import with column mappings (data_import.rs:28-114)."""
    df = read_table(spark, path, "csv", sep=sep)
    return df.select(
        F.col(entity_id).cast("string").alias("entity_id"),
        F.col(entity_name).cast("string").alias("name"),
        F.col(entity_type).cast("string").alias("entity_type"),
    )


def read_relationships_csv(
    spark: SparkSession,
    path: str,
    source: str = "source",
    target: str = "target",
    rel_type: str = "type",
    sep: str = ",",
) -> DataFrame:
    df = read_table(spark, path, "csv", sep=sep)
    return df.select(
        F.col(source).cast("string").alias("subj"),
        F.col(rel_type).cast("string").alias("pred"),
        F.col(target).cast("string").alias("obj"),
    )


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", **options
) -> None:
    """Unified writer — the 4-table graph workspace the reference only
    half-implemented (persistence/parquet.rs:376-421 left relationships/
    chunks/documents as TODOs; we write all of them)."""
    if fmt == "iceberg" and iceberg_available(df.sparkSession):
        df.writeTo(path).using("iceberg").createOrReplace()
        return
    if fmt == "json":
        df.write.mode(mode).options(**options).json(path)
        return
    df.write.mode(mode).options(**options).parquet(path)


def save_graph_workspace(
    tables: dict[str, DataFrame], base_dir: str, fmt: str = "parquet"
) -> None:
    """entities/relationships/chunks/documents layout
    (persistence/parquet.rs:8-14)."""
    mapping = {
        "entities": "nodes",
        "relationships": "edges",
        "chunks": "chunks",
        "documents": "documents",
    }
    for file_name, table_name in mapping.items():
        if table_name in tables:
            write_table(tables[table_name], f"{base_dir}/{file_name}", fmt)


# ---------------------------------------------------------------------------
# Graph exchange formats (pipeline/data_import.rs:36-43 declares RDF/Turtle
# and GraphML; the reference's importers are TODO no-ops returning zero
# rows, data_import.rs:532-556 — these are real implementations of the
# declared surface).
# ---------------------------------------------------------------------------

_NT_PATTERN = (
    r"^\s*(?:<([^>]*)>|(_:\S+))\s+<([^>]*)>\s+"
    r"(?:<([^>]*)>|(_:\S+)|\"((?:[^\"\\]|\\.)*)\"(?:\^\^<[^>]*>|@[\w-]+)?)"
    r"\s*\.\s*$"
)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """N-Triples (the line-oriented RDF subset; Turtle files that stick to
    one triple per line also parse) → (subj, pred, obj, obj_is_literal).

    Fully distributed: ``spark.read.text`` + one JVM-side regex per line —
    no Python in the path. Comment/blank lines drop out; malformed lines
    drop out PERMISSIVE-style (the reference's max_errors tolerance maps to
    "skip and count": filter on non-null parse).
    """
    lines = spark.read.text(path)
    parsed = lines.where(
        (F.length(F.trim("value")) > 0) & ~F.trim(F.col("value")).startswith("#")
    ).select(
        F.regexp_extract("value", _NT_PATTERN, 1).alias("s_iri"),
        F.regexp_extract("value", _NT_PATTERN, 2).alias("s_bnode"),
        F.regexp_extract("value", _NT_PATTERN, 3).alias("pred"),
        F.regexp_extract("value", _NT_PATTERN, 4).alias("o_iri"),
        F.regexp_extract("value", _NT_PATTERN, 5).alias("o_bnode"),
        F.regexp_extract("value", _NT_PATTERN, 6).alias("o_lit"),
        F.col("value"),
    )
    ok = parsed.where(F.col("pred") != "")
    return ok.select(
        F.when(F.col("s_iri") != "", F.col("s_iri"))
        .otherwise(F.col("s_bnode"))
        .alias("subj"),
        "pred",
        F.when(F.col("o_iri") != "", F.col("o_iri"))
        .when(F.col("o_bnode") != "", F.col("o_bnode"))
        .otherwise(F.col("o_lit"))
        .alias("obj"),
        ((F.col("o_iri") == "") & (F.col("o_bnode") == "")).alias(
            "obj_is_literal"
        ),
    )


def read_graphml(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """GraphML → (nodes(node_id, attrs map), edges(source, target, attrs)).

    Files are XML documents, so the unit of parallelism is the FILE:
    ``wholetext`` scan → one ``mapInPandas`` xml.etree parse per file.
    Fine for graph-exchange workloads (many medium files); a single
    monolithic GraphML file is inherently one task — split upstream.
    """
    docs = spark.read.text(path, wholetext=True)

    def parse(batches):
        import xml.etree.ElementTree as ET

        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["value"]:
                try:
                    root = ET.fromstring(content)
                except ET.ParseError:
                    continue  # PERMISSIVE: skip unparseable files

                def strip(tag: str) -> str:
                    return tag.rsplit("}", 1)[-1]

                for el in root.iter():
                    if strip(el.tag) == "node":
                        attrs = {
                            d.attrib.get("key", ""): (d.text or "")
                            for d in el
                            if strip(d.tag) == "data"
                        }
                        rows.append(
                            ("node", el.attrib.get("id", ""), "", attrs)
                        )
                    elif strip(el.tag) == "edge":
                        attrs = {
                            d.attrib.get("key", ""): (d.text or "")
                            for d in el
                            if strip(d.tag) == "data"
                        }
                        rows.append(
                            (
                                "edge",
                                el.attrib.get("source", ""),
                                el.attrib.get("target", ""),
                                attrs,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["kind", "a", "b", "attrs"]
            )

    parsed = docs.mapInPandas(
        parse, schema="kind string, a string, b string, attrs map<string,string>"
    )
    nodes = parsed.where(F.col("kind") == "node").select(
        F.col("a").alias("node_id"), F.col("attrs")
    )
    edges = parsed.where(F.col("kind") == "edge").select(
        F.col("a").alias("source"), F.col("b").alias("target"), F.col("attrs")
    )
    return nodes, edges


_TTL_TOKEN = re.compile(
    r"""
      <[^>]*>                               # IRI ref
    | "(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>]*>|[^\s;,.]+)|@[\w-]+)?  # literal (+dtype/lang)
    | '(?:[^'\\]|\\.)*'(?:\^\^(?:<[^>]*>|[^\s;,.]+)|@[\w-]+)?
    | @?[A-Za-z][\w.-]*:[^\s;,.\]]*         # prefixed name / @prefix decl
    | _:[\w.-]+                             # blank node label
    | [;,.\[\]]                             # punctuation
    | @[\w-]+                               # @prefix / @base keywords
    | [Aa](?=[\s;,.])                       # 'a' → rdf:type
    | [^\s;,.\[\]]+                         # bare token (numbers, PREFIX, true)
    """,
    re.VERBOSE,
)
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _parse_turtle_doc(content: str):
    """Tokenize one Turtle document → [(subj, pred, obj, is_literal)].

    Subset: @prefix/@base (and SPARQL-style PREFIX/BASE), IRIs, prefixed
    names, blank-node labels, literals with datatype/language tags, the
    ``a`` keyword, ``;`` and ``,`` continuations, ``#`` comments,
    statements spanning lines. Not covered (skipped permissively, as the
    reference's PERMISSIVE import tolerance allows): nested ``[...]``
    property lists and ``(...)`` collections.
    """
    # strip comments outside quoted strings AND <IRI> refs (IRIs routinely
    # contain '#' fragments), line by line
    lines = []
    for ln in content.splitlines():
        out, in_q, q, in_iri, i = [], False, "", False, 0
        while i < len(ln):
            ch = ln[i]
            if in_q:
                out.append(ch)
                if ch == "\\" and i + 1 < len(ln):
                    out.append(ln[i + 1])
                    i += 1
                elif ch == q:
                    in_q = False
            elif in_iri:
                out.append(ch)
                if ch == ">":
                    in_iri = False
            elif ch in "\"'":
                in_q, q = True, ch
                out.append(ch)
            elif ch == "<":
                in_iri = True
                out.append(ch)
            elif ch == "#":
                break
            else:
                out.append(ch)
            i += 1
        lines.append("".join(out))
    toks = _TTL_TOKEN.findall("\n".join(lines))

    prefixes: dict[str, str] = {}
    base = ""

    def expand(tok: str):
        """Token → (value, is_literal) or None if unusable."""
        if tok.startswith("<"):
            iri = tok[1:-1]
            return (base + iri if base and "://" not in iri else iri), False
        if tok.startswith("_:"):
            return tok, False
        if tok[0] in "\"'":
            q = tok[0]
            end = tok.rfind(q)
            return tok[1:end].replace('\\"', '"').replace("\\'", "'"), True
        if tok in ("a", "A"):
            return _RDF_TYPE, False
        if ":" in tok:
            pfx, local = tok.split(":", 1)
            if pfx in prefixes:
                return prefixes[pfx] + local, False
            return tok, False
        # bare literal token (number / boolean)
        return tok, True

    triples = []
    i, n = 0, len(toks)
    subj = pred = None
    depth = 0  # inside [...] / (...) → skip
    while i < n:
        t = toks[i]
        if t == "[" or t == "(":
            depth += 1
            i += 1
            continue
        if t == "]" or t == ")":
            depth = max(0, depth - 1)
            i += 1
            continue
        if depth:
            i += 1
            continue
        low = t.lower()
        if low in ("@prefix", "prefix") and i + 2 < n:
            decl, iri = toks[i + 1], toks[i + 2]
            if decl.endswith(":") and iri.startswith("<"):
                prefixes[decl[:-1]] = iri[1:-1]
            i += 3
            continue
        if low in ("@base", "base") and i + 1 < n:
            if toks[i + 1].startswith("<"):
                base = toks[i + 1][1:-1]
            i += 2
            continue
        if t == ".":
            subj = pred = None
            i += 1
            continue
        if t == ";":
            pred = None
            i += 1
            continue
        if t == ",":
            i += 1
            continue
        val = expand(t)
        if val is None:
            i += 1
            continue
        if subj is None:
            subj = val[0]
        elif pred is None:
            pred = val[0]
        else:
            triples.append((subj, pred, val[0], val[1]))
        i += 1
    return triples


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Turtle RDF → (subj, pred, obj, obj_is_literal).

    The declared-but-unimplemented reference surface
    (pipeline/data_import.rs:36-43; its Turtle importer is a TODO no-op).
    Turtle is stateful (file-scoped @prefix/@base), so the unit of
    parallelism is the FILE — ``wholetext`` scan, one tokenizer pass per
    file inside ``mapInPandas``. Line-oriented N-Triples content also
    parses (it is a Turtle subset), but prefer :func:`read_ntriples` for
    .nt data — that path is JVM-only and line-parallel.
    """
    docs = spark.read.text(path, wholetext=True)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["value"]:
                rows.extend(_parse_turtle_doc(content))
            yield pd.DataFrame(
                rows, columns=["subj", "pred", "obj", "obj_is_literal"]
            )

    return docs.mapInPandas(
        parse,
        schema="subj string, pred string, obj string, obj_is_literal boolean",
    )
