"""Pins the driver-facing KG stage contract: every ``queries()`` KG entry
must match the single-process Python oracle's parquet dump exactly
(rows, column names/dtypes, values) — the same compare the driver's
CORRECTNESS gate performs via DuckDB.

This is the strongest form of the e2e check in test_pipeline_e2e.py: not
P/R ≥ 0.95 but bit-exact equality at the correctness fixture size.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"

KG_QUERIES = [
    "kg_chunks",
    "kg_mentions",
    "kg_entities_raw",
    "kg_clusters",
    "kg_nodes",
    "kg_edges",
    "kg_node_stats",
]

# twin-dump and recall-shaped entries (single-process reimplementations /
# exact-side-plus-recall-bound checks)
TWIN_QUERIES = [
    "dedup_simhash",
    "pagerank_nation_chain",
    "label_propagation",
    "custom_ner",
    "hash_embeddings",
    "hybrid_search",
    "dedup_embedding_cosine",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


@pytest.fixture(scope="module")
def harness(spark):
    queries = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return spark, queries, oracles, con


@pytest.mark.parametrize("name", TWIN_QUERIES)
def test_twin_query_matches_oracle(harness, name):
    _assert_query_matches(harness, name)


@pytest.mark.parametrize("name", KG_QUERIES)
def test_kg_stage_matches_oracle_dump(harness, name):
    _assert_query_matches(harness, name)


def _assert_query_matches(harness, name):
    spark, queries, oracles, con = harness
    assert name in oracles, f"{name} must have a DuckDB oracle"
    got = _canon(queries[name](spark, SF_DIR).toPandas())
    exp = _canon(con.sql(oracles[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp) and len(got) > 0
    for col in got.columns:
        if got[col].dtype.kind == "f":
            pd.testing.assert_series_equal(
                got[col], exp[col].astype(got[col].dtype), check_exact=True
            )
        else:
            assert got[col].astype(object).equals(exp[col].astype(object)), col
