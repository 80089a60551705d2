"""Semantic entity merger — ported reference vectors + twin/JVM parity.

Reference: graphrag-rs entity/semantic_merging.rs (heuristic no-LLM path;
its own test module rs:417-553 is ported verbatim below, plus parity
checks the reference cannot express: the JVM candidate-edge similarity
column against the Python twin row-by-row, the O(E) adjacency replay
against the O(n²) greedy scan, and the blocked candidate generator
against the exact all-pairs path).
"""

from __future__ import annotations

import random

import pytest

from graphrag_rs_spark.operators.semantic_merge import (
    apply_merges,
    candidate_match_edges,
    merging_statistics,
    semantic_merge_entities,
)
from graphrag_rs_spark.rules import semantic_merge as sm


def _apple_entities():
    # semantic_merging.rs:421-444
    return [
        sm.MergeEntity("entity1", "Apple Inc", "ORGANIZATION", 0.9),
        sm.MergeEntity("entity2", "Apple Inc.", "ORGANIZATION", 0.8),
        sm.MergeEntity("entity3", "Microsoft", "ORGANIZATION", 0.9),
    ]


# ---------------------------------------------------------------- rules twin


def test_merger_creation_stats():
    # rs:445-453
    stats = merging_statistics(0.8)
    assert stats.similarity_threshold == 0.8
    assert not stats.uses_llm
    assert not stats.llm_available
    assert stats.max_description_tokens == 512  # rs:38


def test_string_similarity_vectors():
    # rs:500-507
    assert sm.string_similarity("Apple", "Apple") == 1.0
    assert sm.string_similarity("Apple Inc", "Apple Inc.") > 0.8
    assert sm.string_similarity("Apple", "Microsoft") < 0.3
    # exact formula pins (derived by hand from rs:208-234)
    assert sm.string_similarity("Apple Inc", "Apple Inc.") == 0.9  # contain
    assert sm.string_similarity("apple", "APPLE") == 1.0  # case fold
    assert sm.string_similarity("New York City", "New York") == 0.9
    assert sm.string_similarity("Alpha Beta", "Beta Gamma") == pytest.approx(
        1 / 3
    )  # word Jaccard
    assert sm.string_similarity("Apple", "Microsoft") == 0.0


def test_entity_grouping():
    # rs:454-473 (threshold 0.7)
    groups = sm.group_similar_entities(_apple_entities(), 0.7)
    assert len(groups) == 1
    assert sorted(groups[0]) == [0, 1]  # Apple Inc + Apple Inc.


def test_heuristic_merge_decision():
    # rs:475-498 (threshold 0.8)
    decision = sm.heuristic_merge_decision(_apple_entities()[:2])
    assert decision.should_merge
    assert decision.confidence > 0.8
    assert decision.merged_name is not None
    # hand pins: name sim 0.9 (containment); longest name wins
    assert decision.confidence == pytest.approx(0.9)
    assert decision.merged_name == "Apple Inc."


def test_heuristic_decision_type_gate_and_low_similarity():
    # rs:171-182 branches
    mixed = [
        sm.MergeEntity("e1", "Apple Inc", "ORGANIZATION", 0.9),
        sm.MergeEntity("e2", "Apple Inc.", "LOCATION", 0.8),
    ]
    d = sm.heuristic_merge_decision(mixed)
    assert not d.should_merge and d.confidence == 1.0
    assert d.reasoning == "Different entity types"

    far = [
        sm.MergeEntity("e1", "Alpha Beta", "ORGANIZATION", 0.9),
        sm.MergeEntity("e2", "Beta Gamma", "ORGANIZATION", 0.8),
    ]
    d = sm.heuristic_merge_decision(far)
    assert not d.should_merge
    assert d.confidence == pytest.approx(1 - 1 / 3)


def test_entity_merging():
    # rs:509-553
    entities = [
        sm.MergeEntity(
            "entity1", "Apple Inc", "ORGANIZATION", 0.9, mentions=["chunk1"]
        ),
        sm.MergeEntity(
            "entity2", "Apple Inc.", "ORGANIZATION", 0.8, mentions=["chunk2"]
        ),
    ]
    decision = sm.EntityMergeDecision(
        should_merge=True,
        confidence=0.9,
        reasoning="Test merge",
        merged_name="Apple Inc.",
        merged_description="Merged Apple entity",
    )
    merged = sm.merge_entities(entities, decision)
    assert merged.name == "Apple Inc."
    assert len(merged.mentions) == 2
    assert merged.confidence >= 0.8
    # hand pin: max(avg(0.9, 0.8), 0.9) = 0.9, id/type from first member
    assert merged.confidence == pytest.approx(0.9)
    assert merged.id == "entity1"
    assert merged.entity_type == "ORGANIZATION"


def test_combine_descriptions_mention_branch():
    # rs:254-271 — branches on mention PRESENCE only
    with_m = sm.MergeEntity("e1", "Apple", "ORG", 0.9, mentions=["x"])
    without = sm.MergeEntity("e2", "Apple Inc", "ORG", 0.8)
    assert sm.combine_descriptions([with_m, without]) == (
        "Entity 'Apple' mentioned in context; "
        "Entity 'Apple Inc' of type ORG"
    )


def test_select_best_name_tie_breaks():
    # rs:236-252: longest; equal length → higher confidence; Rust max_by
    # keeps the LAST maximal element
    ents = [
        sm.MergeEntity("a", "Apple", "ORG", 0.9),
        sm.MergeEntity("b", "Grape", "ORG", 0.95),
        sm.MergeEntity("c", "Mango", "ORG", 0.95),
    ]
    assert sm.select_best_name(ents) == "Mango"
    assert sm.select_best_name([]) == "Merged Entity"


def test_adjacency_replay_equals_greedy_scan():
    """group_from_adjacency ≡ group_similar_entities on randomized lists
    (the distributed path's correctness argument, exercised)."""
    rng = random.Random(42)
    names = [
        "Apple Inc", "Apple Inc.", "Apple", "Microsoft", "Microsoft Corp",
        "Google", "Google LLC", "Alpha Beta", "Beta Gamma", "Gamma Delta",
        "New York", "New York City", "York",
    ]
    types = ["ORGANIZATION", "LOCATION"]
    for trial in range(25):
        k = rng.randint(2, len(names))
        ents = [
            sm.MergeEntity(f"e{i}", rng.choice(names), rng.choice(types), 0.9)
            for i in range(k)
        ]
        threshold = rng.choice([0.6, 0.7, 0.8])
        expected = sm.group_similar_entities(ents, threshold)
        adjacency: dict[int, set[int]] = {}
        for i in range(k):
            for j in range(i + 1, k):
                simv = sm.combined_similarity(
                    ents[i].name,
                    ents[i].entity_type,
                    ents[j].name,
                    ents[j].entity_type,
                )
                if simv > threshold:
                    adjacency.setdefault(i, set()).add(j)
        got = sm.group_from_adjacency(range(k), adjacency)
        assert got == expected, f"trial {trial}"


# ------------------------------------------------------------- Spark operator


@pytest.fixture()
def apple_df(spark):
    return spark.createDataFrame(
        [
            ("entity1", "Apple Inc", "ORGANIZATION", 0.9, 2, 1),
            ("entity2", "Apple Inc.", "ORGANIZATION", 0.8, 1, 2),
            ("entity3", "Microsoft", "ORGANIZATION", 0.9, 0, 3),
        ],
        "entity_id string, name string, entity_type string, "
        "confidence double, n_mentions long, order long",
    )


def test_jvm_similarity_matches_twin(spark):
    rows = [
        ("Apple Inc", "ORG", "Apple Inc.", "ORG"),
        ("Apple", "ORG", "Microsoft", "ORG"),
        ("Alpha Beta", "ORG", "Beta Gamma", "ORG"),
        ("Alpha Beta", "ORG", "Beta Gamma", "LOC"),
        ("apple", "ORG", "APPLE", "ORG"),
        ("New York City", "LOC", "New York", "LOC"),
        ("A B C", "X", "C D E F", "X"),
        ("Solo", "X", "Solo", "Y"),
    ]
    df = spark.createDataFrame(
        [
            (i, n1, t1, n2, t2)
            for i, (n1, t1, n2, t2) in enumerate(rows)
        ],
        "order long, name1 string, type1 string, name2 string, type2 string",
    )
    from graphrag_rs_spark.operators.semantic_merge import (
        _combined_sim_col,
        _name_tokens,
    )
    from pyspark.sql import functions as F

    got = {
        r["order"]: r["sim"]
        for r in df.select(
            "order",
            F.lower("name1").alias("lname1"),
            F.lower("name2").alias("lname2"),
            _name_tokens("name1").alias("toks1"),
            _name_tokens("name2").alias("toks2"),
            "type1",
            "type2",
        )
        .withColumn("sim", _combined_sim_col())
        .collect()
    }
    for i, (n1, t1, n2, t2) in enumerate(rows):
        assert got[i] == pytest.approx(
            sm.combined_similarity(n1, t1, n2, t2)
        ), rows[i]


def test_semantic_merge_entities_end_to_end(spark, apple_df):
    decisions = semantic_merge_entities(
        apple_df, threshold=0.7, order_col="order"
    ).collect()
    by_id = {r["entity_id"]: r for r in decisions}
    assert len(by_id) == 3
    apple1, apple2 = by_id["entity1"], by_id["entity2"]
    assert apple1["group_id"] == "entity1" and apple1["is_seed"]
    assert apple2["group_id"] == "entity1" and not apple2["is_seed"]
    assert apple1["should_merge"] and apple2["should_merge"]
    assert apple1["group_size"] == 2
    assert apple1["merged_name"] == "Apple Inc."
    # max(avg(0.9, 0.8), decision 0.9) = 0.9
    assert apple1["merged_confidence"] == pytest.approx(0.9)
    assert apple1["merged_n_mentions"] == 3  # 2 + 1 mentions concatenated
    assert apple1["merged_description"] == (
        "Entity 'Apple Inc' mentioned in context; "
        "Entity 'Apple Inc.' mentioned in context"
    )
    ms = by_id["entity3"]
    assert ms["group_id"] is None and ms["group_size"] == 1
    assert not ms["should_merge"]


def test_apply_merges(spark, apple_df):
    decisions = semantic_merge_entities(
        apple_df, threshold=0.7, order_col="order"
    )
    merged = {
        r["entity_id"]: r for r in apply_merges(apple_df, decisions).collect()
    }
    assert set(merged) == {"entity1", "entity3"}
    assert merged["entity1"]["name"] == "Apple Inc."
    assert merged["entity1"]["confidence"] == pytest.approx(0.9)
    assert merged["entity3"]["name"] == "Microsoft"
    assert merged["entity3"]["confidence"] == pytest.approx(0.9)


def test_default_order_uses_entity_id_without_window_funnel(spark, apple_df):
    # no order_col: entity_id itself is the order key. Groups match the
    # explicit-order run (entity_id sort == the fixture's order), and
    # the plan has NO unpartitioned Window (the old row_number funnel
    # pushed the whole entity table through one task).
    decisions = semantic_merge_entities(apple_df.drop("order"), threshold=0.7)
    by_id = {r["entity_id"]: r for r in decisions.collect()}
    assert by_id["entity1"]["is_seed"]
    assert by_id["entity2"]["group_id"] == "entity1"
    assert by_id["entity1"]["merged_name"] == "Apple Inc."
    assert by_id["entity3"]["group_id"] is None
    plan = decisions._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_low_threshold_above_gate_refuses_blocking(spark, apple_df):
    # threshold < 0.3 makes every same-type pair a match edge — dense by
    # definition, silently unrepresentable by blocking — so the operator
    # must refuse rather than lose matches the exact path finds
    with pytest.raises(ValueError, match="all-pairs"):
        candidate_match_edges(apple_df, 0.2, all_pairs_gate=2)
    # below the gate the exact path still serves low thresholds
    edges = candidate_match_edges(apple_df, 0.2, all_pairs_gate=100)
    got = {(r["id1"], r["id2"]) for r in edges.collect()}
    assert ("entity1", "entity3") in got  # same-type, disjoint names


def test_blocked_candidates_match_all_pairs(spark):
    """Above-gate blocked generator ≡ exact all-pairs on token-sharing
    names (the documented blocking contract)."""
    rng = random.Random(7)
    firsts = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne"]
    suffixes = ["", " Inc", " Inc.", " Corp", " LLC", " Industries"]
    rows = []
    for i in range(60):
        name = rng.choice(firsts) + rng.choice(suffixes)
        rows.append(
            (f"e{i:03d}", name, rng.choice(["ORG", "LOC"]), 0.9, 0, i)
        )
    df = spark.createDataFrame(
        rows,
        "entity_id string, name string, entity_type string, "
        "confidence double, n_mentions long, order long",
    )
    exact = {
        (r["id1"], r["id2"])
        for r in candidate_match_edges(
            df, 0.7, all_pairs_gate=10_000
        ).collect()
    }
    blocked = {
        (r["id1"], r["id2"])
        for r in candidate_match_edges(df, 0.7, all_pairs_gate=0).collect()
    }
    assert exact  # fixture produces matches
    assert blocked == exact
