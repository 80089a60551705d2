"""Source/sink registry."""

from graphrag_rs_spark.sources.registry import read_table, write_table  # noqa: F401
