"""Corpus knowledge graph + bidirectional index + fallback relations.

Twins re-express the reference loops (corpus/knowledge_graph.rs,
entity/bidirectional_index.rs, entity/llm_relationship_extractor.rs) in
plain Python and are compared row-for-row against the Spark operators on
fixtures that exercise every match arm and boundary.
"""

from __future__ import annotations

import math

import pytest

from graphrag_rs_spark.operators import bidirectional_index as bidx
from graphrag_rs_spark.operators import corpus
from graphrag_rs_spark.operators.fallback_relations import (
    extract_relationships_fallback,
)

# --------------------------------------------------------------------------
# fixture: 4 docs, 6 clusters with varying spread
# --------------------------------------------------------------------------

MEMBERS = [
    # cluster, canonical, type, doc, entity, name, confidence
    ("c_ada", "Ada Lovelace", "person", "d1", "e1", "Ada Lovelace", 0.9),
    ("c_ada", "Ada Lovelace", "person", "d1", "e2", "Ada", 0.8),
    ("c_ada", "Ada Lovelace", "person", "d2", "e3", "A. Lovelace", 0.85),
    ("c_ada", "Ada Lovelace", "person", "d3", "e4", "Ada Lovelace", 0.9),
    ("c_engine", "Analytical Engine", "concept", "d1", "e5", "Analytical Engine", 0.7),
    ("c_engine", "Analytical Engine", "concept", "d2", "e6", "the Engine", 0.6),
    ("c_babbage", "Charles Babbage", "person", "d2", "e7", "Charles Babbage", 0.95),
    ("c_london", "London", "location", "d3", "e8", "London", 0.9),
    ("c_london", "London", "location", "d4", "e9", "London", 0.9),
    ("c_rs", "Royal Society", "organization", "d4", "e10", "Royal Society", 0.8),
    ("c_note", "Note G", "concept", "d4", "e11", "Note G", 0.75),
]
MCOLS = ["cluster_id", "canonical_name", "entity_type", "doc_id", "entity_id", "name", "confidence"]


def importance_twin(df, mentions, spread):
    # knowledge_graph.rs:277-290
    return ((math.log(df) + 1.0) * 0.4 + (math.log(mentions) + 1.0) * 0.3 + spread * 0.3) / 3.0


def global_entities_twin(rows):
    by_cluster = {}
    for cid, canon, etype, doc, _eid, name, conf in rows:
        c = by_cluster.setdefault(cid, dict(canon=canon, etype=etype, names=set(), docs=set(), n=0, conf=0.0))
        c["names"].add(name)
        c["docs"].add(doc)
        c["n"] += 1
        c["conf"] = max(c["conf"], conf)
    out = {}
    for cid, c in by_cluster.items():
        df = len(c["docs"])
        out[cid] = dict(
            canonical_name=c["canon"], entity_type=c["etype"],
            document_frequency=df, total_mentions=c["n"],
            aliases=sorted(c["names"]), source_documents=sorted(c["docs"]),
            confidence_score=c["conf"],
            importance_score=importance_twin(df, c["n"], df),
        )
    return out


def relations_twin(rows):
    # knowledge_graph.rs:188-255, pairs oriented lexicographically
    doc_clusters = {}
    for cid, *_rest in [(r[0], r[3]) for r in rows]:
        pass
    for r in rows:
        doc_clusters.setdefault(r[3], set()).add(r[0])
    pair_docs = {}
    for doc, cids in doc_clusters.items():
        cids = sorted(cids)
        for i in range(len(cids)):
            for j in range(i + 1, len(cids)):
                pair_docs.setdefault((cids[i], cids[j]), set()).add(doc)
    return {
        pair: dict(
            document_frequency=len(docs),
            source_documents=sorted(docs),
            confidence=min(0.7 + 0.1 * (len(docs) - 1), 1.0),
        )
        for pair, docs in pair_docs.items()
    }


@pytest.fixture(scope="module")
def members_df(spark):
    return spark.createDataFrame(MEMBERS, MCOLS)


def test_global_entities_match_twin(spark, members_df):
    got = {r["entity_id"]: r.asDict() for r in corpus.global_entities(members_df).collect()}
    want = global_entities_twin(MEMBERS)
    assert set(got) == set(want)
    for cid, w in want.items():
        g = got[cid]
        for k in ("canonical_name", "entity_type", "document_frequency", "total_mentions", "aliases", "source_documents"):
            assert g[k] == w[k], (cid, k)
        assert g["confidence_score"] == pytest.approx(w["confidence_score"])
        assert g["importance_score"] == pytest.approx(w["importance_score"], rel=1e-9)


def test_corpus_relations_match_twin(spark, members_df):
    got = {
        (r["source_entity_id"], r["target_entity_id"]): r.asDict()
        for r in corpus.corpus_relations(members_df).collect()
    }
    want = relations_twin(MEMBERS)
    assert set(got) == set(want)
    for pair, w in want.items():
        g = got[pair]
        assert g["document_frequency"] == w["document_frequency"]
        assert g["source_documents"] == w["source_documents"]
        assert g["confidence"] == pytest.approx(w["confidence"])
        assert g["relation_type"] == "co_occurs"
        assert g["id"] == f"{pair[0]}_{pair[1]}"


def test_corpus_graph_stats(spark, members_df):
    ents = corpus.global_entities(members_df)
    rels = corpus.corpus_relations(members_df)
    row = corpus.corpus_graph_stats(ents, rels).collect()[0]
    want_rels = len(relations_twin(MEMBERS))
    assert row["total_entities"] == 6
    assert row["total_relations"] == want_rels
    assert row["cross_document_entities"] == 3  # ada, engine, london
    assert row["single_document_entities"] == 3
    assert row["avg_entity_connections"] == pytest.approx(2 * want_rels / 6)
    assert row["graph_density"] == pytest.approx(want_rels / (6 * 5 / 2))
    assert row["largest_component_size"] == 6  # the ref's declared shortcut


def test_corpus_query_and_views(spark, members_df):
    ents = corpus.global_entities(members_df)
    hits = corpus.corpus_query(ents, "lovelace").collect()
    assert [h["entity_id"] for h in hits] == ["c_ada"]  # name + alias match
    # alias-only match: "the Engine" alias contains "engine" (and canonical)
    assert {h["entity_id"] for h in corpus.corpus_query(ents, "engine").collect()} == {"c_engine"}
    top = corpus.top_entities(ents, 2).collect()
    want = sorted(global_entities_twin(MEMBERS).items(), key=lambda kv: (-kv[1]["importance_score"], kv[0]))
    assert [t["entity_id"] for t in top] == [want[0][0], want[1][0]]
    assert {r["entity_id"] for r in corpus.entities_by_type(ents, "person").collect()} == {"c_ada", "c_babbage"}
    assert {r["entity_id"] for r in corpus.cross_document_entities(ents).collect()} == {"c_ada", "c_engine", "c_london"}


def test_corpus_stats_quality_weighting(spark, members_df):
    ents = corpus.global_entities(members_df)
    rels = corpus.corpus_relations(members_df)
    row = corpus.corpus_stats(members_df, ents, rels).collect()[0]
    twin_e = global_entities_twin(MEMBERS)
    twin_r = relations_twin(MEMBERS)
    assert row["documents_processed"] == 4
    assert row["total_entities_extracted"] == len(MEMBERS)
    assert row["unique_entities_after_linking"] == 6
    ratio = 3 / len(MEMBERS)
    assert row["cross_document_entity_ratio"] == pytest.approx(ratio)
    assert row["avg_entities_per_document"] == pytest.approx(len(MEMBERS) / 4)
    e_conf = sum(v["confidence_score"] for v in twin_e.values()) / 6
    r_conf = sum(v["confidence"] for v in twin_r.values()) / len(twin_r)
    assert row["entity_confidence_avg"] == pytest.approx(e_conf)
    assert row["relation_confidence_avg"] == pytest.approx(r_conf)
    # collection_processor.rs:99-102
    assert row["overall_quality_score"] == pytest.approx(0.3 * e_conf + 0.3 * r_conf + 0.4 * ratio)


# --------------------------------------------------------------------------
# bidirectional index (entity/bidirectional_index.rs)
# --------------------------------------------------------------------------

MAPPINGS = [
    ("e1", "ch1"), ("e1", "ch2"), ("e1", "ch3"),
    ("e2", "ch1"), ("e2", "ch2"),
    ("e3", "ch2"),
    ("e4", "ch4"),
    ("e1", "ch1"),  # duplicate — the rust index is containment-guarded
]


@pytest.fixture(scope="module")
def mentions_df(spark):
    return spark.createDataFrame(MAPPINGS, ["entity_id", "chunk_id"])


def test_co_occurring_entities(spark, mentions_df):
    # rs:291-309 twin
    e2c, c2e = {}, {}
    for e, c in MAPPINGS:
        e2c.setdefault(e, set()).add(c)
        c2e.setdefault(c, set()).add(e)
    want = {}
    for e, chunks in e2c.items():
        for ch in chunks:
            for other in c2e[ch]:
                if other != e:
                    want[(e, other)] = want.get((e, other), 0) + 1
    got = {
        (r["entity_id"], r["other_entity_id"]): r["shared_chunks"]
        for r in bidx.co_occurring_entities(mentions_df).collect()
    }
    assert got == want
    only_e2 = bidx.co_occurring_entities(mentions_df, "e2").collect()
    assert {(r["other_entity_id"], r["shared_chunks"]) for r in only_e2} == {("e1", 2), ("e3", 1)}


def test_common_entities_and_dense_chunks(spark, mentions_df):
    common = [(r["entity_id"], r["chunk_count"]) for r in bidx.common_entities(mentions_df, 2).collect()]
    assert common == [("e1", 3), ("e2", 2)]  # desc, rs:315-331
    dense = [(r["chunk_id"], r["entity_count"]) for r in bidx.dense_chunks(mentions_df, 2).collect()]
    assert dense == [("ch2", 3), ("ch1", 2)]


def test_index_statistics(spark, mentions_df):
    row = bidx.index_statistics(mentions_df).collect()[0]
    assert (row["total_entities"], row["total_chunks"], row["total_mappings"]) == (4, 4, 7)
    assert row["avg_chunks_per_entity"] == pytest.approx(7 / 4)
    assert row["avg_entities_per_chunk"] == pytest.approx(7 / 4)


# --------------------------------------------------------------------------
# fallback relationship extraction (llm_relationship_extractor.rs:266-441)
# --------------------------------------------------------------------------


def infer_twin(t1, t2, n1, n2, ctx):
    """Literal port of infer_relationship_with_context (rs:321-441)."""
    c = ctx.lower()
    p1, p2 = c.find(n1.lower()), c.find(n2.lower())
    if p1 < 0 or p2 < 0:
        return None
    w = c[min(p1, p2): min(max(p1, p2) + 50, len(c))]

    def any_kw(*kws):
        return any(k in w for k in kws)

    pair = (t1, t2)
    personish = ("PERSON", "CHARACTER", "SPEAKER")
    if pair in [("PERSON", "PERSON"), ("CHARACTER", "CHARACTER"), ("SPEAKER", "SPEAKER")]:
        if any_kw("said", "replied", "responded"):
            return ("RESPONDS_TO", 0.85)
        if any_kw("asked", "questioned"):
            return ("QUESTIONS", 0.85)
        if any_kw("taught", "explained"):
            return ("TEACHES", 0.80)
        if any_kw("discussed", "spoke about"):
            return ("DISCUSSES", 0.80)
        if any_kw("loved", "admired"):
            return ("ADMIRES", 0.85)
        if any_kw("argued", "disagreed"):
            return ("ARGUES_WITH", 0.85)
        if any_kw("met", "encountered"):
            return ("MEETS", 0.75)
        return ("INTERACTS_WITH", 0.60)
    if t1 in personish and t2 == "CONCEPT":
        if any_kw("discussed", "spoke of"):
            return ("DISCUSSES", 0.80)
        if any_kw("defined", "described"):
            return ("DEFINES", 0.85)
        if any_kw("questioned", "wondered about"):
            return ("QUESTIONS", 0.80)
        return ("MENTIONS", 0.70)
    if t1 == "CONCEPT" and t2 in personish:
        return ("DISCUSSED_BY", 0.70)
    if pair in [("PERSON", "ORGANIZATION"), ("ORGANIZATION", "PERSON")]:
        if any_kw("works for", "employed by"):
            return ("WORKS_FOR", 0.90)
        if any_kw("founded", "CEO", "leads"):  # "CEO" unreachable: w is lowered
            return ("LEADS", 0.90)
        return ("ASSOCIATED_WITH", 0.65)
    if pair in [("PERSON", "LOCATION"), ("CHARACTER", "LOCATION")]:
        if any_kw("born in", "from"):
            return ("BORN_IN", 0.90)
        if any_kw("lives in", "resides in"):
            return ("LIVES_IN", 0.85)
        if any_kw("traveled to", "visited"):
            return ("VISITED", 0.80)
        return ("LOCATED_IN", 0.70)
    if pair in [("ORGANIZATION", "LOCATION"), ("LOCATION", "ORGANIZATION")]:
        if any_kw("headquartered", "based in"):
            return ("HEADQUARTERED_IN", 0.90)
        return ("LOCATED_IN", 0.75)
    if pair == ("CONCEPT", "CONCEPT"):
        if any_kw("similar to", "related to"):
            return ("RELATED_TO", 0.75)
        if any_kw("opposite", "contrasts with"):
            return ("CONTRASTS_WITH", 0.80)
        return ("ASSOCIATED_WITH", 0.60)
    if pair in [("PERSON", "EVENT"), ("CHARACTER", "EVENT")]:
        return ("PARTICIPATES_IN", 0.75)
    if pair == ("EVENT", "LOCATION"):
        return ("OCCURS_IN", 0.80)
    if abs(p1 - p2) < 100:
        return ("CO_OCCURS", 0.50)
    return None


CHUNKS = [
    ("k1", "Socrates discussed love with Phaedrus in Athens."),
    ("k2", "Maria said hello to Ivan. Later Ivan replied warmly to Maria."),
    ("k3", "Grace works for Turing Labs and lives in Cambridge."),
    ("k4", "Turing Labs is headquartered in Cambridge near the river."),
    ("k5", "Recursion is similar to induction, while chaos is the opposite of order."),
    ("k6", "Kernels. " + "x" * 200 + " Widgets appear here far away from kernels."),
    ("k7", "Ada attended the Great Exhibition held in London."),
    ("k8", "Duality was defined by Niels carefully."),
    ("k9", "The CEO of Acme is Jane."),
    ("k10", "Hamlet met Ophelia; the ghost appeared."),
]

CHUNK_ENTITIES = [
    # k1: PERSON+PERSON discussed -> DISCUSSES? no: same-kind persons probe
    # 'discussed' only at arm 4 -> DISCUSSES 0.80
    ("k1", "p_socrates", "Socrates", "PERSON"),
    ("k1", "p_phaedrus", "Phaedrus", "PERSON"),
    ("k1", "c_love", "love", "CONCEPT"),
    ("k2", "p_ivan", "Ivan", "PERSON"),
    ("k2", "p_maria", "Maria", "PERSON"),
    ("k3", "p_grace", "Grace", "PERSON"),
    ("k3", "o_tlabs", "Turing Labs", "ORGANIZATION"),
    ("k3", "l_cambridge", "Cambridge", "LOCATION"),
    ("k4", "o_tlabs", "Turing Labs", "ORGANIZATION"),
    ("k4", "l_cambridge", "Cambridge", "LOCATION"),
    ("k5", "c_recursion", "recursion", "CONCEPT"),
    ("k5", "c_induction", "induction", "CONCEPT"),
    ("k5", "c_chaos", "chaos", "CONCEPT"),
    ("k5", "c_order", "order", "CONCEPT"),
    # far apart + untyped arm -> distance gate (>100 chars) drops the pair
    ("k6", "x_kernels", "Kernels", "ARTIFACT"),
    ("k6", "x_widgets", "Widgets", "ARTIFACT"),
    # PERSON+EVENT and EVENT+LOCATION arms
    ("k7", "p_ada", "Ada", "PERSON"),
    ("k7", "v_exhibition", "Great Exhibition", "EVENT"),
    ("k7", "l_london", "London", "LOCATION"),
    # CONCEPT defined by PERSON: (CONCEPT, PERSON) -> DISCUSSED_BY (id order)
    ("k8", "c_duality", "Duality", "CONCEPT"),
    ("k8", "p_niels", "Niels", "PERSON"),
    # CEO probe is unreachable (window lowercased) -> ASSOCIATED_WITH
    ("k9", "o_acme", "Acme", "ORGANIZATION"),
    ("k9", "p_jane", "Jane", "PERSON"),
    # mixed person kinds (CHARACTER vs PERSON) fall to the default arm
    ("k10", "a_hamlet", "Hamlet", "CHARACTER"),
    ("k10", "p_ophelia", "Ophelia", "PERSON"),
    # name not present in chunk text -> dropped before inference
    ("k10", "p_ghostwriter", "Yorick", "PERSON"),
]


def pairs_twin():
    by_chunk = {}
    for ch, eid, name, etype in CHUNK_ENTITIES:
        by_chunk.setdefault(ch, []).append((eid, name, etype))
    content = dict(CHUNKS)
    out = {}
    for ch, ents in by_chunk.items():
        ents = sorted(ents)  # operator contract: entity_id ascending
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                e1, e2 = ents[i], ents[j]
                got = infer_twin(e1[2], e2[2], e1[1], e2[1], content[ch])
                if got is not None:
                    out[(ch, e1[0], e2[0])] = got
    return out


def test_fallback_relations_match_twin(spark):
    chunks = spark.createDataFrame(CHUNKS, ["chunk_id", "content"])
    ents = spark.createDataFrame(
        CHUNK_ENTITIES, ["chunk_id", "entity_id", "name", "entity_type"]
    )
    got = {
        (r["chunk_id"], r["source_entity_id"], r["target_entity_id"]):
            (r["relation_type"], r["confidence"])
        for r in extract_relationships_fallback(ents, chunks).collect()
    }
    want = pairs_twin()
    assert set(got) == set(want)
    for k, (rt, cf) in want.items():
        assert got[k][0] == rt, (k, got[k], rt)
        assert got[k][1] == pytest.approx(cf)
    # spot-pin the interesting arms
    assert want[("k1", "p_phaedrus", "p_socrates")] == ("DISCUSSES", 0.80)
    assert want[("k2", "p_ivan", "p_maria")] == ("RESPONDS_TO", 0.85)
    assert want[("k3", "o_tlabs", "p_grace")] == ("WORKS_FOR", 0.90)
    assert want[("k4", "l_cambridge", "o_tlabs")] == ("HEADQUARTERED_IN", 0.90)
    assert want[("k5", "c_induction", "c_recursion")] == ("RELATED_TO", 0.75)
    assert want[("k7", "p_ada", "v_exhibition")] == ("PARTICIPATES_IN", 0.75)
    assert want[("k8", "c_duality", "p_niels")] == ("DISCUSSED_BY", 0.70)
    assert want[("k9", "o_acme", "p_jane")] == ("ASSOCIATED_WITH", 0.65)
    assert want[("k10", "a_hamlet", "p_ophelia")] == ("CO_OCCURS", 0.50)
    assert ("k6", "x_kernels", "x_widgets") not in want  # distance gate
    assert not any(k[0] == "k10" and "ghostwriter" in k[1] + k[2] for k in want)
