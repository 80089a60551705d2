"""Pins the Iceberg call shapes the parquet workspace must stay
isomorphic to (no Iceberg jar in this container — see
sources/iceberg_contract.py for why this is a contract test and not a
round-trip)."""

from __future__ import annotations

from graphrag_rs_spark.sources.iceberg_contract import (
    EDGES_PARTIAL_MERGE,
    ENTITIES_RAW_MERGE,
    snapshot_rollback_call,
    sql_parses,
    workspace_ddl,
)
from graphrag_rs_spark.streaming.ingest import (
    merge_edges_partial,
    merge_entities_raw,
)


def test_all_pinned_statements_parse_as_spark_sql(spark):
    stmts = [
        ENTITIES_RAW_MERGE.merge_sql(),
        EDGES_PARTIAL_MERGE.merge_sql(),
        snapshot_rollback_call("ws.entities_raw", 1234567890),
        *workspace_ddl().values(),
    ]
    for sql in stmts:
        assert sql_parses(spark, sql), f"pinned SQL no longer parses:\n{sql}"
    # and the validator itself can fail
    assert not sql_parses(spark, "MERGE INTO WHEN banana")


def _entities(spark, rows):
    return spark.createDataFrame(
        rows,
        "entity_id string, name string, entity_type string, "
        "confidence double, mention_count bigint, aliases array<string>, "
        "order_key string",
    )


def test_entities_merge_spec_matches_workspace_merge(spark):
    old = _entities(spark, [
        # matched, target wins name (higher confidence)
        ("E1", "Alice Cooper", "PERSON", 0.9, 3, ["Alice"], "b"),
        # target-only row must pass through
        ("E2", "Acme Corp", "ORGANIZATION", 0.8, 1, [], "a"),
    ])
    new = _entities(spark, [
        # matched, source wins name (higher confidence), aliases union
        ("E1", "Alice M Cooper", "PERSON", 0.95, 2, ["A. Cooper"], "a"),
        # source-only row must insert
        ("E3", "Berlin", "LOCATION", 0.7, 5, ["BER"], "c"),
    ])
    def canon(df):
        return {
            (r[0], r[1], r[2], r[3], r[4], tuple(r[5]), r[6])
            for r in df.collect()
        }

    want = canon(merge_entities_raw(old, new))
    got = canon(ENTITIES_RAW_MERGE.apply(old, new))
    assert got == want
    # spot-check the semantics themselves, not just agreement
    by_id = {r[0]: r for r in got}
    assert by_id["E1"][1] == "Alice M Cooper"      # max_by(confidence)
    assert by_id["E1"][3] == 0.95                  # greatest
    assert by_id["E1"][4] == 5                     # summed mentions
    assert by_id["E1"][5] == ("A. Cooper", "Alice")  # sorted union
    assert by_id["E1"][6] == "a"                   # least order_key
    assert "E2" in by_id and "E3" in by_id


def _edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, contexts array<string>, "
        "n_occurrences bigint",
    )


def test_edges_merge_spec_matches_workspace_merge(spark):
    old = _edges(spark, [
        ("A", "KNOWS", "B", ["c1", "c2"], 4),
        ("A", "KNOWS", "C", ["c1"], 1),
    ])
    new = _edges(spark, [
        ("A", "KNOWS", "B", ["c2", "c3"], 2),
        ("X", "WORKS_AT", "Y", ["c9"], 7),
    ])
    want = {
        (r[0], r[1], r[2], tuple(r[3]), r[4])
        for r in merge_edges_partial(old, new).collect()
    }
    got = {
        (r[0], r[1], r[2], tuple(r[3]), r[4])
        for r in EDGES_PARTIAL_MERGE.apply(old, new).collect()
    }
    assert got == want
    assert ("A", "KNOWS", "B", ("c1", "c2", "c3"), 6) in got


def test_null_keys_follow_merge_sql_semantics(spark):
    # the generated ON clause is plain `t.k = s.k`: a NULL key never
    # matches, so a NULL-key target row passes through UNCHANGED and a
    # NULL-key source row INSERTS — two output rows, each keeping its
    # own values (apply() must not pair them via null-safe equality,
    # and must not blank the target row's columns)
    old = _entities(spark, [
        (None, "Ghost T", "PERSON", 0.9, 3, ["gt"], "b"),
        ("E1", "Alice", "PERSON", 0.8, 1, [], "a"),
    ])
    new = _entities(spark, [
        (None, "Ghost S", "PERSON", 0.5, 7, ["gs"], "c"),
    ])
    got = sorted(
        [
            (r[0], r[1], r[3], r[4], tuple(r[5]))
            for r in ENTITIES_RAW_MERGE.apply(old, new).collect()
        ],
        key=str,
    )
    assert got == sorted([
        (None, "Ghost T", 0.9, 3, ("gt",)),   # target row untouched
        (None, "Ghost S", 0.5, 7, ("gs",)),   # source row inserted
        ("E1", "Alice", 0.8, 1, ()),          # unmatched target
    ], key=str)


def test_merge_sql_carries_every_non_key_column(spark):
    # a column added to the workspace schema without a MERGE update rule
    # should fail HERE, not silently stay stale on the cluster path
    sql = ENTITIES_RAW_MERGE.merge_sql()
    for col in ("name", "entity_type", "confidence", "mention_count",
                "aliases", "order_key"):
        assert f"{col} =" in sql
    sql = EDGES_PARTIAL_MERGE.merge_sql()
    for col in ("contexts", "n_occurrences"):
        assert f"{col} =" in sql
