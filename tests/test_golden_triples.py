"""Golden-triple regression gate.

tests/golden/triples_seed1234.json freezes the EXACT (subj, pred, obj)
set and canonical node ids the pipeline emits for a fixed seeded input
(30 conversations incl. mega-conversations, seed 1234). Any semantic
drift in chunking, extraction, canonicalization, or materialization —
including "harmless" refactors — breaks this test and must either be a
deliberate, documented semantics change (regenerate the fixture in the
same commit and say why) or a bug.

The reference ships no golden triple corpus (SURVEY.md §5 "Not
present"); this file closes that gap for our own build.
"""

from __future__ import annotations

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "triples_seed1234.json")


def test_pipeline_matches_golden_triples(spark):
    with open(GOLDEN) as f:
        golden = json.load(f)

    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.fixtures import generate_transcripts
    from graphrag_rs_spark.plans.pipeline import build_graph

    rows = generate_transcripts(
        golden["n_convs"], seed=golden["seed"],
        mega_every=golden["mega_every"], mega_turns=golden["mega_turns"],
    )
    tdf = spark.createDataFrame(
        rows,
        schema="conv_id string, turn_idx int, role string, text string, "
               "tool string, ts timestamp",
    )
    tables = build_graph(spark, tdf, PipelineConfig())

    got_triples = sorted(
        (r["subj"], r["pred"], r["obj"])
        for r in tables["edges"].select("subj", "pred", "obj").collect()
    )
    want_triples = sorted(tuple(t) for t in golden["triples"])
    assert got_triples == want_triples, (
        f"{len(set(got_triples) - set(want_triples))} unexpected / "
        f"{len(set(want_triples) - set(got_triples))} missing triples vs golden"
    )

    got_nodes = sorted(
        r["cluster_id"] for r in tables["nodes"].select("cluster_id").collect()
    )
    assert got_nodes == golden["nodes"]
