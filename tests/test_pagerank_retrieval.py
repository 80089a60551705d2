"""PageRank-enhanced retrieval vs an independent numpy twin.

The twin re-derives the reference semantics (pagerank_retrieval.rs:134-311,
graph/pagerank.rs:182-300,536-562) from scratch in plain Python — no shared
code with the Spark operator — so a hash match here pins the distributed
dataflow against an independent reading of the rust.
"""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.pagerank_retrieval import (
    global_pagerank_scores,
    lexical_entity_scores,
    pagerank_search,
    quick_entity_search,
)

# --- fixture tables ----------------------------------------------------

ENTITIES = [
    # (id, name, entity_type)
    ("E1", "Alice Liddell", "person"),
    ("E2", "Alice", "person"),
    ("E3", "Bob", "person"),
    ("E4", "Wonderland Tea Company", "organization"),
    ("E5", "Cheshire", "concept"),
]

EDGES = [
    # (subj, pred, obj) — E5 is dangling (no out-edges), E4 isolated-ish
    ("E1", "knows", "E2"),
    ("E2", "knows", "E3"),
    ("E3", "works_at", "E4"),
    ("E1", "likes", "E5"),
    ("E2", "likes", "E5"),
]

CHUNKS = [
    ("C1", "Alice person met Bob for tea in wonderland."),
    ("C2", "The Wonderland Tea Company brews excellent tea."),
    ("C3", "Cheshire grinned at alice person twice."),
]

MENTIONS = [
    # (entity_id, chunk_id) — E2 mentioned twice in C3-matching chunks via
    # duplicate rows to exercise the per-mention (not per-chunk) bonus
    ("E1", "C1"),
    ("E2", "C1"),
    ("E2", "C3"),
    ("E2", "C3"),
    ("E3", "C1"),
    ("E4", "C2"),
    ("E5", "C3"),
]

QUERY = "alice person"


# --- numpy-free twin (plain python, independent derivation) ------------


def twin_lexical(query, entities, mentions, chunks):
    q_words = query.lower().split()
    chunk_text = {cid: txt for cid, txt in chunks}
    matching = {
        cid for cid, txt in chunks if query.lower() in txt.lower()
    }
    scores = {}
    for eid, name, etype in entities:
        e_words = f"{name} {etype}".lower().split()
        inter = sum(1 for w in q_words if w in e_words)
        union = len(q_words) + len(e_words) - inter
        sim = inter / union if union else 0.0
        jac = sim if inter > 0 and sim > 0.1 else 0.0
        bonus = 0.3 * sum(
            1 for ent, cid in mentions if ent == eid and cid in matching
        )
        s = jac + bonus
        if s > 0.0:
            scores[eid] = s
    return scores


def twin_pagerank(edges, reset, damping=0.85, max_iter=20, tol=1e-6,
                  check_every=5):
    pairs = sorted({(s, o) for s, _, o in edges})
    nodes = sorted({s for s, o in pairs} | {o for s, o in pairs})
    n = len(nodes)
    outd = {}
    for s, o in pairs:
        outd[s] = outd.get(s, 0) + 1
    total = sum(reset.get(v, 0.0) for v in nodes)
    if total > 0:
        tp = {v: reset.get(v, 0.0) / total for v in nodes}
    else:
        tp = {v: 1.0 / n for v in nodes}
    ranks = dict(tp)
    for it in range(max_iter):
        inflow = {v: 0.0 for v in nodes}
        for s, o in pairs:
            inflow[o] += ranks[s] / outd[s]
        dmass = sum(r for v, r in ranks.items() if v not in outd)
        new = {
            v: (1 - damping) * tp[v]
            + damping * (inflow[v] + dmass * tp[v])
            for v in nodes
        }
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            delta = sum(abs(new[v] - ranks[v]) for v in nodes)
            if delta < tol:
                return new
        ranks = new
    return ranks


def twin_search(query, entities, edges, mentions, chunks,
                max_results=10, vector_weight=0.3, pagerank_weight=0.4,
                min_score_threshold=0.1, **pr_kw):
    lex = twin_lexical(query, entities, mentions, chunks)
    if not lex:
        return []
    ppr = twin_pagerank(edges, lex, **pr_kw)
    chunk_text = {cid: txt for cid, txt in chunks}
    ent_info = {eid: (name, etype) for eid, name, etype in entities}
    rows = []
    for eid in sorted(set(lex) | set(ppr)):
        v = lex.get(eid, 0.0)
        p = ppr.get(eid, 0.0)
        score = vector_weight * v + pagerank_weight * p
        if score < min_score_threshold:
            continue
        member_chunks = sorted(
            {cid for ent, cid in mentions if ent == eid}
        )
        if member_chunks:
            for cid in member_chunks:
                rows.append((eid, cid, chunk_text[cid], score, v, p))
        else:
            name, etype = ent_info[eid]
            rows.append(
                (eid, f"entity_{eid}", f"{name}: {etype}", score, v, p)
            )
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:max_results]


# --- spark side ---------------------------------------------------------


@pytest.fixture()
def tables(spark):
    entities = spark.createDataFrame(
        ENTITIES, "id string, name string, entity_type string"
    )
    edges = spark.createDataFrame(
        EDGES, "subj string, pred string, obj string"
    )
    mentions = spark.createDataFrame(
        MENTIONS, "entity_id string, chunk_id string"
    )
    chunks = spark.createDataFrame(CHUNKS, "chunk_id string, text string")
    return entities, edges, mentions, chunks


def test_lexical_scores_match_twin(spark, tables):
    entities, edges, mentions, chunks = tables
    got = {
        r["id"]: r["vector_score"]
        for r in lexical_entity_scores(
            entities, mentions, chunks, QUERY
        ).collect()
    }
    want = twin_lexical(QUERY, ENTITIES, MENTIONS, CHUNKS)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_lexical_quirks_pinned(spark, tables):
    """Hand-derived values: the duplicate-count Jaccard and the
    bonus-without-Jaccard quirk (rs:264-273 inserts the 0.3 even when the
    similarity arm stayed below threshold)."""
    entities, edges, mentions, chunks = tables
    got = {
        r["id"]: r["vector_score"]
        for r in lexical_entity_scores(
            entities, mentions, chunks, QUERY
        ).collect()
    }
    # E2 "Alice person": inter=2, union=2+2-2=2, sim=1.0; mentions C1
    # (matches "alice person") once + C3 (matches) twice => +0.9
    assert got["E2"] == pytest.approx(1.0 + 0.9)
    # E1 "Alice Liddell person": inter=2, union=2+3-2=3, sim=2/3; C1 match
    assert got["E1"] == pytest.approx(2.0 / 3.0 + 0.3)
    # E3 "Bob person": inter=1 ("person"), union=2+2-1=3, sim=1/3 > 0.1;
    # mention C1 matches => 1/3 + 0.3
    assert got["E3"] == pytest.approx(1.0 / 3.0 + 0.3)
    # E5 "Cheshire concept": inter=0 -> jac 0, but its C3 mention text
    # contains the query => bonus-only row (the reference quirk)
    assert got["E5"] == pytest.approx(0.3)
    # E4: no word overlap, C2 does not contain the query => absent
    assert "E4" not in got


def test_pagerank_search_matches_twin(spark, tables):
    entities, edges, mentions, chunks = tables
    got = [
        (
            r["entity_id"],
            r["chunk_id"],
            r["content"],
            r["score"],
            r["vector_score"],
            r["pagerank_score"],
        )
        for r in pagerank_search(
            entities, edges, mentions, chunks, QUERY, max_results=20
        ).collect()
    ]
    want = twin_search(
        QUERY, ENTITIES, EDGES, MENTIONS, CHUNKS, max_results=20
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        for gi, wi in zip(g[3:], w[3:]):
            assert gi == pytest.approx(wi, abs=1e-9)


def test_pagerank_search_fallback_chunk_rows(spark, tables):
    """An entity surviving the threshold with no mention rows emits the
    entity_{id} placeholder (rs:195-209)."""
    entities, edges, mentions, chunks = tables
    no_mentions = mentions.where("entity_id <> 'E2'")
    rows = pagerank_search(
        entities, edges, no_mentions, chunks, QUERY, max_results=20
    ).collect()
    e2 = [r for r in rows if r["entity_id"] == "E2"]
    assert len(e2) == 1
    assert e2[0]["chunk_id"] == "entity_E2"
    assert e2[0]["content"] == "Alice: person"


def test_empty_query_match_returns_empty(spark, tables):
    entities, edges, mentions, chunks = tables
    out = pagerank_search(
        entities, edges, mentions, chunks, "zzz qqq xyzzy"
    )
    assert out.count() == 0
    assert out.columns == [
        "entity_id",
        "chunk_id",
        "content",
        "score",
        "vector_score",
        "pagerank_score",
    ]


def test_global_pagerank_uniform_sums_to_one(spark, tables):
    _, edges, _, _ = tables
    ranks = global_pagerank_scores(edges).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-6)
    want = twin_pagerank(EDGES, {})
    got = {r["id"]: r["rank"] for r in ranks}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_quick_entity_search_scoring(spark, tables):
    entities, _, _, _ = tables
    rows = quick_entity_search(entities, "alice").collect()
    got = {r["entity_id"]: r for r in rows}
    # exact lowercase match -> 1.0; substring -> 0.8 (rs:337-344)
    assert got["E2"]["score"] == pytest.approx(1.0)
    assert got["E1"]["score"] == pytest.approx(0.8)
    assert set(got) == {"E1", "E2"}
    assert got["E2"]["content"] == "Alice: person"
    assert got["E2"]["chunk_id"] == "entity_E2"
    assert [r["entity_id"] for r in rows] == ["E2", "E1"]
