"""Heuristic relationship extraction between co-occurring entities
(graphrag-rs entity/llm_relationship_extractor.rs:266-441 — the
``extract_relationships_fallback`` path used when no LLM is configured).

For every unordered pair of entities mentioned in the same chunk, the
reference locates both names in the lowercased chunk text, takes the
context window from the earlier mention to 50 chars past the later one,
and dispatches on the (entity_type, entity_type) tuple + keyword probes in
that window to produce a typed, scored relationship. Everything here is a
single JVM ``when`` cascade over one pair self-join — no Python in the hot
path, so the operator rides whole-stage codegen and scales with the
mentions table.

Faithfulness notes:

* The reference iterates chunk entities in input-vector order (rs:279-296),
  which depends on upstream extraction order; we orient pairs by
  ``entity_id`` ascending so output is deterministic. The type-tuple match
  arms are direction-sensitive (e.g. (PERSON, CONCEPT) ≠ (CONCEPT,
  PERSON)), so this choice is part of the operator contract.
* rs:383 probes ``window.contains("CEO")`` against a window cut from the
  *lowercased* context — it can never match. Reproduced by omitting the
  probe (behaviour-identical) rather than "fixing" it to ``ceo``.
* Rust ``str::find`` returns byte offsets; Spark ``locate`` is
  character-based. Identical on ASCII, and only window boundaries (not
  keyword membership near the cut points) can differ on multibyte text.

Input contract: ``chunk_entities`` (chunk_id, entity_id, name,
entity_type) + ``chunks`` (chunk_id, content).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (type1_set, type2_set, [(keywords, rel_type, confidence)...], default)
# transcribed arm-for-arm from llm_relationship_extractor.rs:338-436.
_PERSONISH = ("PERSON", "CHARACTER", "SPEAKER")
_ARMS = [
    # rs:340-359 — same-kind person pairs only (mixed kinds fall through)
    (
        [("PERSON", "PERSON"), ("CHARACTER", "CHARACTER"), ("SPEAKER", "SPEAKER")],
        [
            (("said", "replied", "responded"), "RESPONDS_TO", 0.85),
            (("asked", "questioned"), "QUESTIONS", 0.85),
            (("taught", "explained"), "TEACHES", 0.80),
            (("discussed", "spoke about"), "DISCUSSES", 0.80),
            (("loved", "admired"), "ADMIRES", 0.85),
            (("argued", "disagreed"), "ARGUES_WITH", 0.85),
            (("met", "encountered"), "MEETS", 0.75),
        ],
        ("INTERACTS_WITH", 0.60),
    ),
    # rs:361-371
    (
        [(t, "CONCEPT") for t in _PERSONISH],
        [
            (("discussed", "spoke of"), "DISCUSSES", 0.80),
            (("defined", "described"), "DEFINES", 0.85),
            (("questioned", "wondered about"), "QUESTIONS", 0.80),
        ],
        ("MENTIONS", 0.70),
    ),
    # rs:374-376
    ([("CONCEPT", t) for t in _PERSONISH], [], ("DISCUSSED_BY", 0.70)),
    # rs:379-387 (the unreachable "CEO" probe omitted, see module doc)
    (
        [("PERSON", "ORGANIZATION"), ("ORGANIZATION", "PERSON")],
        [
            (("works for", "employed by"), "WORKS_FOR", 0.90),
            (("founded", "leads"), "LEADS", 0.90),
        ],
        ("ASSOCIATED_WITH", 0.65),
    ),
    # rs:390-400 — (LOCATION, PERSON) deliberately absent, as in the ref
    (
        [("PERSON", "LOCATION"), ("CHARACTER", "LOCATION")],
        [
            (("born in", "from"), "BORN_IN", 0.90),
            (("lives in", "resides in"), "LIVES_IN", 0.85),
            (("traveled to", "visited"), "VISITED", 0.80),
        ],
        ("LOCATED_IN", 0.70),
    ),
    # rs:403-409
    (
        [("ORGANIZATION", "LOCATION"), ("LOCATION", "ORGANIZATION")],
        [(("headquartered", "based in"), "HEADQUARTERED_IN", 0.90)],
        ("LOCATED_IN", 0.75),
    ),
    # rs:412-420
    (
        [("CONCEPT", "CONCEPT")],
        [
            (("similar to", "related to"), "RELATED_TO", 0.75),
            (("opposite", "contrasts with"), "CONTRASTS_WITH", 0.80),
        ],
        ("ASSOCIATED_WITH", 0.60),
    ),
    # rs:423-428
    ([("PERSON", "EVENT"), ("CHARACTER", "EVENT")], [], ("PARTICIPATES_IN", 0.75)),
    ([("EVENT", "LOCATION")], [], ("OCCURS_IN", 0.80)),
]


def _any_kw(window: Column, keywords: tuple[str, ...]) -> Column:
    return reduce(
        lambda acc, k: acc | window.contains(k),
        keywords[1:],
        window.contains(keywords[0]),
    )


def _pair_is(t1: Column, t2: Column, pairs: list[tuple[str, str]]) -> Column:
    return reduce(
        lambda acc, p: acc | ((t1 == p[0]) & (t2 == p[1])),
        pairs[1:],
        (t1 == pairs[0][0]) & (t2 == pairs[0][1]),
    )


def extract_relationships_fallback(
    chunk_entities: DataFrame, chunks: DataFrame
) -> DataFrame:
    """→ (chunk_id, source_entity_id, target_entity_id, relation_type,
    confidence), one row per in-chunk pair where the reference's heuristic
    fires (rs:266-299 pair loop + rs:321-441 inference)."""
    ents = chunk_entities.select("chunk_id", "entity_id", "name", "entity_type")
    a, b = ents.alias("a"), ents.alias("b")
    pairs = a.join(
        b,
        (F.col("a.chunk_id") == F.col("b.chunk_id"))
        & (F.col("a.entity_id") < F.col("b.entity_id")),
    ).select(
        F.col("a.chunk_id").alias("chunk_id"),
        F.col("a.entity_id").alias("source_entity_id"),
        F.col("b.entity_id").alias("target_entity_id"),
        F.lower(F.col("a.name")).alias("n1"),
        F.lower(F.col("b.name")).alias("n2"),
        F.col("a.entity_type").alias("t1"),
        F.col("b.entity_type").alias("t2"),
    )
    joined = pairs.join(
        chunks.select("chunk_id", F.lower("content").alias("ctx")), "chunk_id"
    )

    # rs:330-336 — 1-based locate; 0 means not found → no relationship.
    #
    # The explode(array(...)) wrappers are deliberate optimizer barriers:
    # plain projections get CollapseProject'd + filter-substituted, which
    # inlines the locate/substring definitions into EVERY downstream
    # reference — the ~34 keyword probes each re-scanned the chunk text
    # (measured: 38× substring / 228× locate in the optimized plan, 32 s
    # for a 127k-pair input; at real scale that 30× redundant scan would
    # be the operator's entire cost). A Generate node is a boundary
    # Catalyst cannot substitute through, so p1/p2/win are computed once
    # per row; explode of a 1-element array is narrow, codegen-compatible,
    # and adds no rows. Same plan shape, 1× substring / 2× locate, 4 s.
    located = (
        joined.select(
            "*",
            F.explode(
                F.array(
                    F.struct(
                        (F.expr("locate(n1, ctx)") - 1).alias("p1"),
                        (F.expr("locate(n2, ctx)") - 1).alias("p2"),
                    )
                )
            ).alias("pos"),
        )
        .select("*", F.col("pos.p1").alias("p1"), F.col("pos.p2").alias("p2"))
        .drop("pos")
        .where((F.col("p1") >= 0) & (F.col("p2") >= 0))
    )

    windowed = located.select(
        "*",
        F.explode(
            F.array(
                F.expr(
                    "substring(ctx, least(p1, p2) + 1, "
                    "least(greatest(p1, p2) + 50, length(ctx)) - least(p1, p2))"
                )
            )
        ).alias("win"),
    ).drop("ctx", "n1", "n2")

    t1, t2, win = F.col("t1"), F.col("t2"), F.col("win")
    rel = None
    for type_pairs, probes, (def_type, def_conf) in _ARMS:
        arm = _pair_is(t1, t2, type_pairs)
        inner = F.struct(
            F.lit(def_type).alias("rt"), F.lit(def_conf).alias("cf")
        )
        for keywords, rel_type, conf in reversed(probes):
            inner = F.when(
                _any_kw(win, keywords),
                F.struct(F.lit(rel_type).alias("rt"), F.lit(conf).alias("cf")),
            ).otherwise(inner)
        rel = F.when(arm, inner) if rel is None else rel.when(arm, inner)
    # rs:431-438 default: CO_OCCURS 0.50 only when mentions are <100 apart
    rel = rel.otherwise(
        F.when(
            F.abs(F.col("p1") - F.col("p2")) < 100,
            F.struct(F.lit("CO_OCCURS").alias("rt"), F.lit(0.50).alias("cf")),
        )
    )

    return (
        windowed.select(
            "chunk_id",
            "source_entity_id",
            "target_entity_id",
            rel.alias("rel"),
        )
        .where(F.col("rel").isNotNull())
        .select(
            "chunk_id",
            "source_entity_id",
            "target_entity_id",
            F.col("rel.rt").alias("relation_type"),
            F.col("rel.cf").alias("confidence"),
        )
    )
