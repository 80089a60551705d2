"""Implicit relationship inference (inference.rs:53-413).

Rule vectors are hand-derived from the Rust arithmetic (the reference
ships no test module for inference.rs); the Spark operator is checked
row-for-row against a pure-Python replay of the reference's per-target
loop (inference.rs:83-137) built on the same scoring rules.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.inference import (
    find_entities_by_name,
    infer_relationships,
    infer_relationships_batch,
)
from graphrag_rs_spark.rules.inference import (
    calculate_evidence_score,
    calculate_proximity_score,
    entities_near_pattern,
    extract_entity_name,
)


class TestNameExtraction:
    def test_type_prefix_stripped(self):
        # inference.rs:288-295: split at FIRST underscore
        assert extract_entity_name("PERSON_alice_smith") == "alice smith"
        assert extract_entity_name("ORG_acme") == "acme"

    def test_no_underscore_lowercases(self):
        assert extract_entity_name("Alice") == "alice"


class TestProximity:
    def test_bands(self):
        # distances: 1 word apart -> 0.4; 4 -> 0.3; 8 -> 0.2; 15 -> 0.1
        assert calculate_proximity_score("alice met bob", "alice", "bob") == 0.4
        assert (
            calculate_proximity_score(
                "alice w1 w2 w3 bob", "alice", "bob"
            )
            == 0.3
        )
        assert (
            calculate_proximity_score(
                "alice " + "w " * 7 + "bob", "alice", "bob"
            )
            == 0.2
        )
        assert (
            calculate_proximity_score(
                "alice " + "w " * 14 + "bob", "alice", "bob"
            )
            == 0.1
        )
        assert (
            calculate_proximity_score(
                "alice " + "w " * 25 + "bob", "alice", "bob"
            )
            == 0.05
        )

    def test_absent_entity_scores_zero(self):
        assert calculate_proximity_score("alice alone here", "alice", "bob") == 0.0

    def test_multiword_name_never_matches(self):
        # quirk: per-word contains — "alice smith" can't be inside one word
        # (inference.rs:325-331)
        assert (
            calculate_proximity_score("alice smith met bob", "alice smith", "bob")
            == 0.0
        )

    def test_substring_matching(self):
        # word "alice's" contains "alice"
        assert calculate_proximity_score("alice's friend bob", "alice", "bob") == 0.4


class TestNearPattern:
    def test_window_hit_and_miss(self):
        text = "alice and bob were best friends"
        assert entities_near_pattern(text, "alice", "bob", "best friend")
        far = "alice " + "x" * 150 + " best friend " + "y" * 150 + " bob"
        assert not entities_near_pattern(far, "alice", "bob", "best friend")

    def test_first_occurrence_only(self):
        # first "friend" is >100 chars from bob; second is close — the
        # reference only windows the FIRST (inference.rs:381)
        text = "alice friend " + "x" * 200 + " friend bob"
        assert not entities_near_pattern(text, "alice", "bob", "friend")

    def test_absent_pattern(self):
        assert not entities_near_pattern("alice bob", "alice", "bob", "enemy")


class TestEvidenceScore:
    def test_plain_cooccurrence(self):
        # no patterns, adjacent words: 0.2 base + 0.4 proximity
        s = calculate_evidence_score("alice met bob", "PERSON_alice", "PERSON_bob")
        assert s == pytest.approx(0.6)

    def test_friendship_near(self):
        # "alice and bob are best friends": base 0.2 + proximity 0.4
        # + best friend 0.8*0.5 + friend 0.4*0.5 + friends 0.4*0.5
        # = 0.2 + 0.4 + 0.4 + 0.2 + 0.2 = 1.4 -> clamped 1.0
        s = calculate_evidence_score(
            "alice and bob are best friends", "PERSON_alice", "PERSON_bob"
        )
        assert s == 1.0

    def test_negative_patterns(self):
        # "alice fought bob": base 0.2 + proximity 0.4 + fought -0.5*1.2
        # = 0.6 - 0.6 = 0.0 (float rounding leaves ~1e-16)
        s = calculate_evidence_score("alice fought bob", "PERSON_alice", "PERSON_bob")
        assert s == pytest.approx(0.0, abs=1e-12)

    def test_family_multiplier(self):
        # "alice helped her brother bob": base 0.2 + proximity(dist 3 -> 0.3)
        # then family ×0.8 -> 0.4
        s = calculate_evidence_score(
            "alice helped her brother bob", "PERSON_alice", "PERSON_bob"
        )
        assert s == pytest.approx(0.5 * 0.8)

    def test_pattern_without_context(self):
        # pattern fires but entities not both within ±100 chars -> 0.3 factor
        text = "friendship matters. " + "z" * 150 + " alice and bob talked."
        # base 0.2 + proximity(alice..bob dist 2 -> 0.4) + friendship
        # 0.5*0.3 + friend 0.4*0.3 + friends 0.4*0.3 (both substrings of
        # "friendship" — the plain-contains quirk) = 0.99
        s = calculate_evidence_score(text, "PERSON_alice", "PERSON_bob")
        assert s == pytest.approx(0.2 + 0.4 + 0.15 + 0.12 + 0.12)


def _reference_replay(chunk_rows, target_id, relation_type,
                      min_confidence=0.3, max_candidates=10):
    """Direct transliteration of inference.rs:83-137 over python rows."""
    target_chunks = [
        (cid, text, ents) for cid, text, ents in chunk_rows if target_id in ents
    ]
    scores: dict[str, float] = {}
    for _, text, ents in target_chunks:
        for ent in ents:
            if ent != target_id:
                scores[ent] = scores.get(ent, 0.0) + calculate_evidence_score(
                    text, target_id, ent
                )
    out = []
    for ent, score in scores.items():
        norm = min(score / len(target_chunks), 1.0)
        if norm >= min_confidence:
            out.append((target_id, ent, relation_type, norm, len(target_chunks)))
    out.sort(key=lambda r: (-r[3], r[1]))
    return out[:max_candidates]


CHUNKS = [
    ("c1", "Alice and Bob are best friends.", ["PERSON_alice", "PERSON_bob"]),
    ("c2", "Alice fought the dragon while Bob hid.", ["PERSON_alice", "PERSON_bob", "CONCEPT_dragon"]),
    ("c3", "Alice trusted Carol on the long journey together.", ["PERSON_alice", "PERSON_carol"]),
    ("c4", "Bob and Carol argued about the map.", ["PERSON_bob", "PERSON_carol"]),
    ("c5", "Alice explored the caves.", ["PERSON_alice"]),
]


@pytest.fixture()
def chunk_df(spark):
    return spark.createDataFrame(
        CHUNKS, "chunk_id string, text string, entity_ids array<string>"
    )


class TestSparkOperator:
    def test_matches_reference_replay(self, chunk_df):
        got = [
            (r["source"], r["target"], r["relation_type"],
             pytest.approx(r["confidence"]), r["evidence_count"])
            for r in infer_relationships(chunk_df, "PERSON_alice", "FRIENDS")
            .orderBy(F.col("confidence").desc(), F.col("target"))
            .collect()
        ]
        want = _reference_replay(CHUNKS, "PERSON_alice", "FRIENDS")
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2]
            assert g[3] == w[3]
            assert g[4] == w[4]

    def test_missing_target_empty(self, chunk_df):
        assert infer_relationships(chunk_df, "PERSON_nobody", "FRIENDS").count() == 0

    def test_batch_multiple_targets(self, chunk_df, spark):
        targets = spark.createDataFrame(
            [("PERSON_alice", "FRIENDS"), ("PERSON_bob", "FRIENDS")],
            "target_id string, relation_type string",
        )
        rows = infer_relationships_batch(chunk_df, targets).collect()
        by_source = {}
        for r in rows:
            by_source.setdefault(r["source"], []).append(r)
        for src in by_source:
            want = _reference_replay(CHUNKS, src, "FRIENDS")
            got = sorted(by_source[src], key=lambda r: (-r["confidence"], r["target"]))
            assert [(r["target"], r["evidence_count"]) for r in got] == [
                (w[1], w[4]) for w in want
            ]
            for g, w in zip(got, want):
                assert g["confidence"] == pytest.approx(w[3])

    def test_max_candidates_truncates(self, chunk_df):
        got = infer_relationships(
            chunk_df, "PERSON_alice", "FRIENDS", min_confidence=0.0, max_candidates=1
        ).collect()
        assert len(got) == 1
        want = _reference_replay(
            CHUNKS, "PERSON_alice", "FRIENDS", min_confidence=0.0, max_candidates=1
        )
        assert got[0]["target"] == want[0][1]

    def test_find_entities_by_name(self, spark):
        nodes = spark.createDataFrame(
            [("1", "Alice Smith", "PERSON"), ("2", "alicia", "PERSON"),
             ("3", "Bob", "PERSON")],
            "cluster_id string, name string, entity_type string",
        )
        got = [r["name"] for r in find_entities_by_name(nodes, "ali").collect()]
        assert got == ["Alice Smith", "alicia"]
        first = find_entities_by_name(nodes, "ali").limit(1).collect()
        assert first[0]["name"] == "Alice Smith"
