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
    extract_chunks_llm,
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
