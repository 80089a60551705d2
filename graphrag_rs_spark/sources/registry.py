"""Source / sink registry.

Covers the reference's import surface (graphrag-rs pipeline/data_import.rs:
28-114: CSV/TSV with column mappings, JSON/JSONL streaming ingest with error
tolerance, text/markdown document load lib.rs:1043-1067) plus the Iceberg
path from the north rule — gated behind a capability check since this
container has no Iceberg runtime jar (parquet is the stand-in; the call
sites are identical).
"""

from __future__ import annotations

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
        sep = "\t" if fmt == "tsv" else options.pop("sep", ",")
        return (
            spark.read.options(header=True, sep=sep, inferSchema=True, **options)
            .csv(path)
        )
    if fmt in ("json", "jsonl"):
        # JSONL is Spark's native JSON layout; PERMISSIVE mode gives the
        # reference's max_errors tolerance (data_import.rs:604-612) with
        # corrupt rows quarantined instead of counted
        return (
            spark.read.options(
                mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record", **options
            ).json(path)
        )
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
