"""Linking recall at the BENCHED blocking config, at a scale where the
derived-block cap actually binds.

The e2e parity gate (test_pipeline_e2e.py) runs 60 conversations at the
full-recall config (min_shared_blocks=1), where no block ever exceeds the
derived cap of 128 — so it can never catch recall shed by the cap or by
min_shared_blocks=2 (the documented large-corpus setting bench.py runs).
This gate closes that hole: a 5k-conversation ScaledVocab corpus whose
soundex/end-gram blocks measurably exceed the cap, scored against PLANTED
ground truth (the fixture's variant pools are deterministic per identity,
so the true same-identity pairing of every extracted surface form is known
exactly — no O(n²) oracle needed at this scale).

Recall definition: over pairs of distinct extracted entities whose surface
forms belong to the same planted identity, the fraction assigned the same
cluster_id. Precision is NOT asserted against planted identities — two
independently generated identities can legitimately sit within the
reference linker's edit-distance threshold, and merging them is correct
per the reference semantics (the P/R≥0.95 triple gate covers precision).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.fixtures import (
    ScaledVocab,
    org_name,
    person_name,
    transcripts_df,
)
from graphrag_rs_spark.rules.similarity import normalize_string

N_CONVS = 5000
N_PERSONS = N_CONVS // 2
N_ORGS = N_CONVS // 5


def _truth_map(vocab: ScaledVocab) -> dict[str, str]:
    """normalized surface form -> planted identity key; ambiguous forms
    (one spelling reachable from two identities) are dropped."""
    owner: dict[str, set[str]] = {}

    def add(form: str, ident: str) -> None:
        owner.setdefault(normalize_string(form), set()).add(ident)

    for idx in range(vocab.n_persons):
        base = person_name(idx)
        add(base, f"P{idx}")
        for slot in range(vocab.n_variants):
            from graphrag_rs_spark.fixtures import _typo

            add(_typo(base, random.Random((idx * 1_000_003) ^ (slot * 7_919))),
                f"P{idx}")
    for idx in range(vocab.n_orgs):
        base = org_name(idx)
        add(base, f"O{idx}")
        for slot in range(vocab.n_variants):
            from graphrag_rs_spark.fixtures import _typo

            add(_typo(base, random.Random((idx * 1_000_003) ^ (slot * 7_919))),
                f"O{idx}")
    return {form: next(iter(ids)) for form, ids in owner.items()
            if len(ids) == 1}


def test_stranded_single_token_rescue(spark):
    """The cap's worst case, constructed directly: a single-token entity
    and its typo twin share NO exact-token key (each token is unique), and
    every key they DO share (the 'clar' prefix 4-gram, the soundex code)
    is a hot block over the derived cap. Pre-rescue, the pair was shed
    wholesale; with the rescue window the stranded members get sorted-
    neighborhood pairs that bypass min_shared_blocks."""
    import string

    from graphrag_rs_spark.operators.canonicalize import candidate_pairs

    rows = [("E_target1", "Clarkson", "CONCEPT"),
            ("E_target2", "Clarksoon", "CONCEPT")]  # 1 edit apart
    letters = string.ascii_lowercase
    n = 0
    for a in letters:
        for b in letters:
            if n >= 200:
                break
            rows.append((f"E_f{n}", f"Clark{a}{b}x", "CONCEPT"))
            n += 1
    df = spark.createDataFrame(
        rows, "entity_id string, name string, entity_type string"
    )

    cfg = PipelineConfig(min_shared_blocks=2, hot_block_window=8)
    got = {
        (r["id1"], r["id2"])
        for r in candidate_pairs(df, cfg).select("id1", "id2").collect()
    }
    assert ("E_target1", "E_target2") in got, (
        "stranded typo pair not rescued from the hot derived block"
    )

    cfg_off = PipelineConfig(min_shared_blocks=2, hot_block_window=0)
    got_off = {
        (r["id1"], r["id2"])
        for r in candidate_pairs(df, cfg_off).select("id1", "id2").collect()
    }
    assert ("E_target1", "E_target2") not in got_off, (
        "expected the pre-rescue behavior to shed the pair — if this now "
        "passes without rescue, the fixture no longer exercises the cap"
    )


@pytest.mark.slow
def test_linking_recall_at_benched_config(spark):
    from graphrag_rs_spark.operators.assembly import assemble_documents
    from graphrag_rs_spark.operators.canonicalize import (
        blocking_keys,
        canonicalize_entities,
    )
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import (
        entities_raw_table,
        extract_chunks,
    )

    vocab = ScaledVocab(n_persons=N_PERSONS, n_orgs=N_ORGS)
    cfg = PipelineConfig(shuffle_partitions=16, min_shared_blocks=2)
    transcripts = transcripts_df(
        spark, N_CONVS, seed=42, distributed=True, partitions=32, vocab=vocab
    )
    docs = assemble_documents(transcripts, separator=cfg.turn_separator)
    chunks = chunk_documents(docs, cfg)
    extraction = extract_chunks(chunks, cfg)
    entities = entities_raw_table(extraction).cache()
    entities.count()

    # the gate is only meaningful where the derived cap binds: require
    # over-cap soundex/end-gram blocks, else this test silently degrades
    # to the 60-conv regime the e2e gate already covers
    kind = F.regexp_extract("block_key", r"\|(\w):", 1)
    over_cap = (
        blocking_keys(entities)
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((kind != "t") & (F.col("n") > cfg.max_derived_block_size))
        .count()
    )
    assert over_cap >= 10, (
        f"fixture too small: only {over_cap} over-cap derived blocks — "
        "the cap never binds and the gate is vacuous"
    )

    clusters = canonicalize_entities(entities, cfg)
    members = (
        clusters.join(entities.select("entity_id", "name"), "entity_id")
        .select("entity_id", "cluster_id", "name")
        .collect()
    )

    truth = _truth_map(vocab)
    by_ident: dict[str, dict[str, str]] = {}
    for r in members:
        ident = truth.get(normalize_string(r["name"]))
        if ident:
            # entity_id -> cluster, grouped by planted identity
            by_ident.setdefault(ident, {})[r["entity_id"]] = r["cluster_id"]

    want = got = 0
    misses: list[tuple[str, ...]] = []
    for ident, eids in by_ident.items():
        if len(eids) < 2:
            continue
        items = sorted(eids.items())
        for i in range(len(items) - 1):
            for j in range(i + 1, len(items)):
                want += 1
                if items[i][1] == items[j][1]:
                    got += 1
                elif len(misses) < 10:
                    misses.append((ident, items[i][0], items[j][0]))

    assert want >= 500, f"only {want} truth pairs extracted — fixture too thin"
    recall = got / want
    print(f"\nlinking recall @ min_shared_blocks=2, derived cap "
          f"{cfg.max_derived_block_size}, window {cfg.hot_block_window}: "
          f"{recall:.4f} ({got}/{want} pairs, {over_cap} over-cap blocks)")
    assert recall >= 0.95, (
        f"recall {recall:.4f} < 0.95 at the benched blocking config; "
        f"sample misses: {misses}"
    )
