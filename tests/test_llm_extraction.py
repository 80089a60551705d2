"""Batched-async LLM extractor: parser ladder, retry path, and the full
2-round gleaning conversation through the Spark stage with a recorded
client — the reference's semantic-mode dataflow (llm_extractor.rs /
gleaning_extractor.rs) without a live model."""

from __future__ import annotations

import json

import pytest

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.operators.llm_extraction import (
    LLMCallPolicy,
    RecordedClient,
    build_completion_prompt,
    build_extraction_prompt,
    build_gleaning_prompt,
    deduplicate_triples,
    extract_chunks_llm,
    merge_entity_data,
    parse_extraction_response,
)

GOOD = {
    "entities": [
        {"name": "Alice Cooper", "type": "PERSON", "description": "a person"}
    ],
    "relationships": [],
}


def test_parser_direct_json():
    out = parse_extraction_response(json.dumps(GOOD))
    assert out["entities"][0]["name"] == "Alice Cooper"
    assert out["entities"][0]["type"] == "PERSON"


def test_parser_markdown_fence():
    resp = "Sure! Here you go:\n```json\n" + json.dumps(GOOD) + "\n```\nDone."
    assert parse_extraction_response(resp)["entities"]


def test_parser_embedded_object():
    resp = "preamble text " + json.dumps(GOOD) + " trailing commentary"
    assert parse_extraction_response(resp)["entities"]


def test_parser_garbage_degrades_to_empty():
    out = parse_extraction_response("I cannot help with that.")
    assert out == {"entities": [], "relationships": []}


def test_parser_skips_malformed_items():
    resp = json.dumps({
        "entities": [{"name": "X", "type": "PERSON"}, {"name": ""},
                     "not-a-dict"],
        "relationships": [{"source": "X", "target": "Y",
                           "strength": "not-a-number"},
                          {"source": "X"}],
    })
    out = parse_extraction_response(resp)
    assert len(out["entities"]) == 1
    assert len(out["relationships"]) == 1
    assert out["relationships"][0]["strength"] == 0.5


def test_prompts_carry_reference_contract():
    p = build_extraction_prompt("Some text.", ("PERSON", "ORGANIZATION"))
    assert "PERSON, ORGANIZATION" in p and "Some text." in p
    assert '"entities"' in p and '"relationships"' in p
    g = build_gleaning_prompt(
        "T", ("PERSON",),
        [{"name": "A", "type": "PERSON"}],
        [{"source": "A", "target": "B"}],
    )
    assert "ONLY the NEW" in g and "- A (PERSON)" in g and "- A -> B" in g
    c = build_completion_prompt("T", [{"name": "A"}], [])
    assert 'ONLY "YES"' in c and "Current Entities (1)" in c


def _client_factory():
    """Two chunks: the 'summit' chunk needs a gleaning round (completion
    says NO, the continuation surfaces a missed org + relationship); the
    'weather' chunk is complete after round 1."""
    def make():
        return RecordedClient(
            extraction={
                "Maria Santos attended the summit": json.dumps({
                    "entities": [{"name": "Maria Santos", "type": "PERSON",
                                  "description": "attendee"}],
                    "relationships": [],
                }),
                "The weather was pleasant": json.dumps(
                    {"entities": [], "relationships": []}
                ),
            },
            completion={
                "Maria Santos attended the summit": "NO",
                "The weather was pleasant": "YES",
            },
            gleaning={
                "Maria Santos attended the summit": json.dumps({
                    "entities": [{"name": "Acme Corporation",
                                  "type": "ORGANIZATION",
                                  "description": "host"}],
                    "relationships": [{"source": "Maria Santos",
                                       "target": "Acme Corporation",
                                       "description": "ATTENDED_EVENT_OF",
                                       "strength": 0.8}],
                }),
            },
        )
    return make


def _chunks_df(spark):
    rows = [
        ("c1", "v1", "d1", 0,
         "Maria Santos attended the summit hosted by Acme Corporation."),
        ("c2", "v1", "d1", 1, "The weather was pleasant."),
    ]
    return spark.createDataFrame(
        rows,
        "chunk_id string, conv_id string, doc_id string, chunk_idx int, "
        "text string",
    )


def test_gleaning_loop_end_to_end(spark):
    out = extract_chunks_llm(
        _chunks_df(spark), _client_factory(), PipelineConfig(),
        concurrency=4, max_rounds=2,
    )
    rows = {r["chunk_id"]: r for r in out.collect()}
    ents = {e["name"]: e for e in rows["c1"]["entities"]}
    # round-1 entity AND the gleaned one are merged
    assert set(ents) == {"Maria Santos", "Acme Corporation"}
    assert ents["Maria Santos"]["entity_id"] == "PERSON_mariasantos"
    assert ents["Acme Corporation"]["confidence"] == pytest.approx(0.9)
    # mentions are literal offsets into the chunk
    m = ents["Maria Santos"]["mentions"][0]
    assert (m["start"], m["end"]) == (0, len("Maria Santos"))
    # the gleaned relationship resolves names -> entity ids
    t = rows["c1"]["triples"][0]
    assert (t["subj"], t["pred"], t["obj"]) == (
        "PERSON_mariasantos", "ATTENDED_EVENT_OF",
        "ORGANIZATION_acmecorporation",
    )
    # the complete chunk stays empty and alive
    assert rows["c2"]["entities"] == [] and rows["c2"]["triples"] == []


def test_downstream_stages_consume_llm_extraction(spark):
    from graphrag_rs_spark.operators.extraction import (
        entities_raw_table,
        mentions_table,
    )

    ext = extract_chunks_llm(
        _chunks_df(spark), _client_factory(), PipelineConfig(), max_rounds=2
    )
    raw = {r["entity_id"]: r for r in entities_raw_table(ext).collect()}
    assert "PERSON_mariasantos" in raw
    assert mentions_table(ext).count() >= 2


def test_retry_recovers_from_transient_faults(spark):
    base = _client_factory()  # closure-bound: executors can't import tests

    def make():
        c = base()
        c.fail_first = 1  # first call raises; retry must recover
        return c

    out = extract_chunks_llm(
        _chunks_df(spark).where("chunk_id = 'c1'"), make,
        PipelineConfig(), max_rounds=2,
        policy=LLMCallPolicy(max_retries=2, backoff_s=0.01),
    )
    rows = out.collect()
    assert len(rows[0]["entities"]) == 2


def test_exhausted_retries_degrade_to_empty_not_dead_task(spark):
    base = _client_factory()

    def make():
        c = base()
        c.fail_first = 99
        return c

    out = extract_chunks_llm(
        _chunks_df(spark), make, PipelineConfig(),
        policy=LLMCallPolicy(max_retries=1, backoff_s=0.01),
    ).collect()
    assert len(out) == 2
    assert all(r["entities"] == [] for r in out)


# ---------------------------------------------------------------------------
# Reference unit vectors, gleaning_extractor.rs mod tests (:488-614)
# ---------------------------------------------------------------------------

# test_merge_entity_data (gleaning_extractor.rs:519-560): same-name entity
# from a later round wins only via a strictly longer description; a new
# name is appended.
def test_completion_check_parse_reference_vectors():
    """llm_extractor.rs:144-146: trim + uppercase, complete iff the
    response CONTAINS "YES" — substring quirks are parity, not bugs."""
    from graphrag_rs_spark.operators.llm_extraction import (
        completion_says_complete,
    )

    complete = [
        "YES", "yes", "  Yes.  ", "The answer is YES",
        "no, but yesterday's entities were fine",   # 'yesterday' ⊃ YES
        "EYES ONLY",                                # 'EYES' ⊃ YES
        "NO... wait, YES",
    ]
    incomplete = [
        "NO", "no", "  No, entities are missing  ",
        "affirmative", "definitely complete", "", "Y E S", "N",
    ]
    for r in complete:
        assert completion_says_complete(r), r
    for r in incomplete:
        assert not completion_says_complete(r), r


def test_gleaning_loop_uses_reference_completion_parse(spark):
    """A completion response that merely CONTAINS 'yes' inside another
    word stops the gleaning loop (reference substring semantics) — the
    gleaning table must never be consulted."""
    def make():
        return RecordedClient(
            extraction={"Ada wrote": json.dumps({
                "entities": [{"name": "Ada", "type": "PERSON",
                              "description": "d"}],
                "relationships": [],
            })},
            completion={"Ada wrote": "checked against yesterday's notes"},
            gleaning={"Ada wrote": json.dumps({
                "entities": [{"name": "SHOULD NOT APPEAR",
                              "type": "PERSON", "description": "x"}],
                "relationships": [],
            })},
        )

    chunks = spark.createDataFrame(
        [("c1", "v1", "d1", 0, "Ada wrote the first program.")],
        "chunk_id string, conv_id string, doc_id string, chunk_idx int, "
        "text string",
    )
    rows = extract_chunks_llm(
        chunks, make, PipelineConfig(), max_rounds=3
    ).collect()
    names = {e["name"] for e in rows[0]["entities"]}
    assert names == {"Ada"}


def test_merge_entity_data_reference_vector():
    existing = [
        {"name": "Tom Sawyer", "type": "PERSON", "description": "A boy"},
    ]
    new = [
        {"name": "Tom Sawyer", "type": "PERSON",
         "description": "A young boy who lives in St. Petersburg"},
        {"name": "Huck Finn", "type": "PERSON",
         "description": "Tom's friend"},
    ]
    merged = merge_entity_data(existing, new)
    assert len(merged) == 2
    tom = next(e for e in merged if e["name"] == "Tom Sawyer")
    assert len(tom["description"]) > 10  # the longer description won


def test_merge_entity_data_keys_on_name_not_type():
    # The reference key is lowercase name ONLY (gleaning_extractor.rs:
    # 234-246): a same-name entity with a different type still merges.
    merged = merge_entity_data(
        [{"name": "Mercury", "type": "CONCEPT", "description": "element"}],
        [{"name": "mercury", "type": "LOCATION",
          "description": "the first planet"}],
    )
    assert len(merged) == 1
    assert merged[0]["type"] == "LOCATION"  # longer description replaced


def test_merge_entity_data_equal_length_keeps_existing():
    # replacement requires STRICTLY longer (rs:249 uses `>`)
    merged = merge_entity_data(
        [{"name": "X", "type": "A", "description": "12345"}],
        [{"name": "X", "type": "B", "description": "abcde"}],
    )
    assert merged[0]["type"] == "A"


# test_deduplicate_relationships (gleaning_extractor.rs:580-613): key is
# "{src}->{tgt}:{type}" — the exact duplicate collapses, the distinct
# predicate between the same pair survives, first occurrence kept.
def test_deduplicate_triples_reference_vector():
    triples = [
        ("person_tom", "person_huck", "FRIENDS_WITH"),
        ("person_tom", "person_huck", "FRIENDS_WITH"),  # duplicate
        ("person_tom", "location_stpetersburg", "LIVES_IN"),
    ]
    assert deduplicate_triples(triples) == [
        ("person_tom", "person_huck", "FRIENDS_WITH"),
        ("person_tom", "location_stpetersburg", "LIVES_IN"),
    ]
    # predicate IS part of the key
    two_preds = [
        ("person_tom", "person_huck", "FRIENDS_WITH"),
        ("person_tom", "person_huck", "KNOWS"),
    ]
    assert deduplicate_triples(two_preds) == two_preds


# test_find_mentions (gleaning_extractor.rs:565-577): every literal
# occurrence of "Tom" in the reference's test chunk.
def test_find_mentions_reference_vector():
    from graphrag_rs_spark.rules.extraction import find_mentions

    chunk = ("Tom Sawyer is a young boy who lives in St. Petersburg with "
             "his Aunt Polly. Tom is best friends with Huckleberry Finn.")
    mentions = find_mentions(chunk, "Tom")
    assert len(mentions) >= 2
    assert mentions[0] == (0, 3)


# test_normalize_name (gleaning_extractor.rs:539-548) ASSERTS
# "tom_sawyer"/"st_petersburg", but the implementation it tests
# (rs:438-444, identical to entity/mod.rs:758-764) filters spaces out
# BEFORE the space→underscore replace, so it actually returns
# "tomsawyer"/"stpetersburg" — the test module never runs in reference CI
# (needs a live OllamaClient). We pin the IMPLEMENTATION's behavior, which
# is what the oracle-verified pipeline ids are built from.
def test_normalize_name_implementation_behavior():
    from graphrag_rs_spark.rules.extraction import normalize_name

    assert normalize_name("Tom Sawyer") == "tomsawyer"
    assert normalize_name("St. Petersburg") == "stpetersburg"
    assert normalize_name("snake_case_kept") == "snake_case_kept"
