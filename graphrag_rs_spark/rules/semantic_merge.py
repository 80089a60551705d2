"""Pure-Python port of the reference's semantic entity merger
(graphrag-rs entity/semantic_merging.rs).

The reference's ``SemanticEntityMerger`` is a no-LLM-by-default heuristic
merger that is DISTINCT from the string-similarity linker
(string_similarity_linker.rs → operators/canonicalize.py): its similarity
metric is word-set Jaccard with exact/containment short-circuits
(semantic_merging.rs:208-234), grouping is a greedy seed-absorb pass in
input order over a combined 0.7·name + 0.3·type score
(semantic_merging.rs:57-88, 307-330), and the merge decision re-checks a
name-only pairwise mean against a hard-coded 0.8 (rs:132-183 — note the
decision threshold is NOT the constructor's ``similarity_threshold``;
that quirk is preserved).

This module is the single source of truth for the rule semantics: the
Spark operator (operators/semantic_merge.py) runs these functions inside
an Arrow-batched per-component pass, the JVM candidate-edge expressions
are pinned against :func:`combined_similarity` row-by-row in
tests/test_semantic_merge.py, and the reference's own test vectors
(semantic_merging.rs:445-553) are ported there too.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass
class MergeEntity:
    """Mirror of core::Entity's merge-relevant fields
    (semantic_merging.rs uses id/name/entity_type/confidence/mentions/
    embedding; mentions are carried as opaque tokens here — in the Spark
    engine the mentions TABLE is re-pointed via the group map instead)."""

    id: str
    name: str
    entity_type: str
    confidence: float
    mentions: list = field(default_factory=list)
    embedding: Optional[list] = None


@dataclass
class EntityMergeDecision:
    """semantic_merging.rs:10-21."""

    should_merge: bool
    confidence: float
    reasoning: str
    merged_name: Optional[str] = None
    merged_description: Optional[str] = None


@dataclass
class MergingStatistics:
    """semantic_merging.rs:381-402 (config echo; no LLM in this engine)."""

    similarity_threshold: float
    max_description_tokens: int
    uses_llm: bool = False
    llm_available: bool = False


def string_similarity(s1: str, s2: str) -> float:
    """semantic_merging.rs:208-234: exact→1.0, substring containment→0.9,
    else word-set Jaccard (split_whitespace ≡ str.split())."""
    a = s1.lower()
    b = s2.lower()
    if a == b:
        return 1.0
    if b in a or a in b:
        return 0.9
    w1 = set(a.split())
    w2 = set(b.split())
    union = len(w1 | w2)
    if union == 0:
        return 0.0
    return len(w1 & w2) / union


def combined_similarity(
    name1: str, type1: str, name2: str, type2: str
) -> float:
    """calculate_semantic_similarity (rs:307-330): 0.7·name + 0.3·type.

    The reference comments that embeddings would replace this; its
    shipped implementation is exactly this formula."""
    name_sim = string_similarity(name1, name2)
    type_sim = 1.0 if type1 == type2 else 0.0
    return name_sim * 0.7 + type_sim * 0.3


def group_similar_entities(
    entities: Sequence[MergeEntity], threshold: float
) -> list[list[int]]:
    """Greedy seed-absorb grouping in input order (rs:57-88).

    Returns index groups of size ≥ 2 (the reference drops singletons).
    Order semantics preserved exactly: seed i claims every unprocessed j
    with combined similarity STRICTLY above the threshold; claimed
    entities can never seed their own group.
    """
    groups: list[list[int]] = []
    processed: set[int] = set()
    for i, e1 in enumerate(entities):
        if i in processed:
            continue
        group = [i]
        processed.add(i)
        for j, e2 in enumerate(entities):
            if i == j or j in processed:
                continue
            sim = combined_similarity(
                e1.name, e1.entity_type, e2.name, e2.entity_type
            )
            if sim > threshold:
                group.append(j)
                processed.add(j)
        if len(group) > 1:
            groups.append(group)
    return groups


def group_from_adjacency(
    order: Sequence[int], adjacency: dict[int, set[int]]
) -> list[list[int]]:
    """O(E) replay of :func:`group_similar_entities` over precomputed
    match edges (the distributed path: edges are filtered JVM-side, so
    the per-component pass never rescans non-matching pairs).

    Equivalence argument: the greedy loop only ever groups j with seed i
    when sim(i,j) > threshold — i.e. (i,j) is a match edge — and every
    index before the current seed is already processed (each outer i is
    marked processed when visited), so absorbed j are exactly the seed's
    unprocessed neighbors in ascending index order. Replaying adjacency
    in ascending seed order is therefore identical to the O(n²) scan.
    """
    groups: list[list[int]] = []
    processed: set[int] = set()
    for i in order:
        if i in processed:
            continue
        processed.add(i)
        members = [i]
        for j in sorted(adjacency.get(i, ())):
            if j not in processed:
                members.append(j)
                processed.add(j)
        if len(members) > 1:
            groups.append(members)
    return groups


def calculate_name_similarity_heuristic(
    entities: Sequence[MergeEntity],
) -> float:
    """Pairwise mean of name-only string_similarity (rs:185-206)."""
    if len(entities) < 2:
        return 1.0
    total = 0.0
    comparisons = 0
    for i in range(len(entities)):
        for j in range(i + 1, len(entities)):
            total += string_similarity(entities[i].name, entities[j].name)
            comparisons += 1
    return total / comparisons if comparisons else 0.0


def select_best_name(entities: Sequence[MergeEntity]) -> str:
    """Longest name, ties broken by higher confidence (rs:236-252).

    max_by keeps the LAST maximal element under Rust semantics; Python's
    max keeps the first, so iterate with an explicit strictly-greater
    comparison to preserve the reference's tie outcome."""
    if not entities:
        return "Merged Entity"
    best = entities[0]
    for e in entities[1:]:
        if (len(e.name), e.confidence) >= (len(best.name), best.confidence):
            best = e
    return best.name


def combine_descriptions(entities: Sequence[MergeEntity]) -> str:
    """rs:254-271 — note the reference ignores the mention CONTENT; it
    only branches on whether any mention exists."""
    descriptions = []
    for e in entities:
        if e.mentions:
            descriptions.append(f"Entity '{e.name}' mentioned in context")
        else:
            descriptions.append(f"Entity '{e.name}' of type {e.entity_type}")
    if not descriptions:
        return "Merged entity from multiple sources"
    return "; ".join(descriptions)


def heuristic_merge_decision(
    entities: Sequence[MergeEntity],
) -> EntityMergeDecision:
    """rs:132-183. Same-type gate, then name-only pairwise mean > 0.8."""
    if len(entities) < 2:
        return EntityMergeDecision(
            should_merge=False,
            confidence=1.0,
            reasoning="Only one entity in group",
        )
    first = entities[0]
    if not all(e.entity_type == first.entity_type for e in entities):
        return EntityMergeDecision(
            should_merge=False,
            confidence=1.0,
            reasoning="Different entity types",
        )
    name_similarity = calculate_name_similarity_heuristic(entities)
    if name_similarity > 0.8:
        return EntityMergeDecision(
            should_merge=True,
            confidence=name_similarity,
            reasoning=(
                f"High name similarity ({name_similarity:.2f}) "
                "and matching types"
            ),
            merged_name=select_best_name(entities),
            merged_description=combine_descriptions(entities),
        )
    return EntityMergeDecision(
        should_merge=False,
        confidence=1.0 - name_similarity,
        reasoning=f"Low name similarity ({name_similarity:.2f})",
    )


def merge_entities(
    entities: Sequence[MergeEntity], decision: EntityMergeDecision
) -> MergeEntity:
    """rs:332-379: first member's id/type/embedding, concatenated
    mentions, confidence = max(mean member confidence, decision conf)."""
    if not entities:
        raise ValueError("No entities to merge")
    if not decision.should_merge:
        return entities[0]
    merged_name = (
        decision.merged_name
        if decision.merged_name is not None
        else select_best_name(entities)
    )
    all_mentions: list = []
    total_confidence = 0.0
    for e in entities:
        all_mentions.extend(e.mentions)
        total_confidence += e.confidence
    avg_confidence = total_confidence / len(entities)
    return MergeEntity(
        id=entities[0].id,
        name=merged_name,
        entity_type=entities[0].entity_type,
        confidence=max(avg_confidence, decision.confidence),
        mentions=all_mentions,
        embedding=entities[0].embedding,
    )
