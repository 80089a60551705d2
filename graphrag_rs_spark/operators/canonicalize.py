"""Stage D — entity canonicalization: entities_raw → clusters/linkmap.

The reference compares EVERY same-type pair with max-of
{Levenshtein, Jaro-Winkler, token-Jaccard, Soundex} similarity and grows
greedy clusters in entity-insertion order
(graphrag-rs string_similarity_linker.rs:68-127) — O(n²), impossible at
10^9 entities. The Spark-native design keeps the EXACT reference semantics
while making every step distributed:

1. **Blocking-key generation** — every entity emits, per normalized-name
   token: the token itself, its Soundex code, and its 4-char prefix, all
   namespaced by entity type. Pairs that can pass the 0.85 max-of-metrics
   threshold virtually always share one of these (typos → Soundex;
   token add/drop like "New York (City)" → shared token; suffix stems like
   "Corp"/"Corporation" → shared 4-prefix). A recall test vs the oracle's
   all-pairs clustering guards this (SURVEY.md §7.4 hard part 2).
2. **Block-size cap** — Zipf-hot tokens would create quadratic blocks;
   blocks over ``max_block_size`` are dropped (their pairs are
   overwhelmingly sub-threshold). This is the explicit skew guard.
3. **Candidate pairs** — per-block self-join with ``id1 < id2``,
   deduplicated across blocks.
4. **Pair scoring** — Arrow-batched ``mapInPandas`` running the exact
   reference metric suite (rules/similarity.py), same-type gate + threshold
   (string_similarity_linker.rs:130-168).
5. **Connected components** — large-star/small-star over surviving pairs.
   CC components are a SUPERSET partition of the reference's greedy
   clusters (greedy only ever links pairs above threshold, i.e. along CC
   edges), so:
6. **Exact greedy replay per component** — each component (tiny in
   practice: a name-variant family) is handed to an ``applyInPandas`` that
   re-runs the reference's greedy scan in deterministic first-appearance
   order (``order_key = (conv_id, chunk_idx, rank)``), reproducing the
   single-process clustering bit-for-bit, distributed. Components larger
   than ``MAX_COMPONENT_GREEDY`` are re-blocked by (type, first name
   token) so greedy replays per sub-block — no O(n²) straggler task.
7. **Canonical selection** — highest confidence wins, ties break on the
   greater entity_id (deterministic stand-in for Rust ``max_by`` last-wins,
   string_similarity_linker.rs:106-124).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.functions import normalize_name_col
from graphrag_rs_spark.operators.graph import connected_components

PAIR_SCORE_SCHEMA = "id1 string, id2 string, score float"
CLUSTER_ASSIGN_SCHEMA = "entity_id string, cluster_id string"

# A component above this size would run O(n²) pair_similarity calls in ONE
# applyInPandas task (2k → 2M calls ≈ seconds; 10k → 50M ≈ a guaranteed
# straggler), so oversized components are RE-BLOCKED by a stronger key
# (type + first name token) and greedy runs within each sub-block instead.
MAX_COMPONENT_GREEDY = 2_000


def blocking_keys(entities: DataFrame) -> DataFrame:
    """entities(entity_id, name, entity_type, …) → (block_key, entity_id).

    Keys per normalized-name token: ``{type}|t:{token}``,
    ``{type}|s:{soundex(token)}``, and ``{type}|g:{gram}`` for every
    character 4-gram of the token (q-gram blocking, the standard candidate
    generator for string-similarity joins) — Jaro-Winkler-high pairs such as
    "henderson"/"michael anderson" or "corp"/"corporation" always share a
    token 4-gram, while typo pairs ("jhon"/"john") share a Soundex code.
    """
    normed = entities.select(
        "entity_id",
        "entity_type",
        normalize_name_col(F.col("name")).alias("norm_name"),
    )

    def gen_keys(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.similarity import soundex

        for pdf in batches:
            out = []
            for eid, etype, norm in zip(
                pdf["entity_id"], pdf["entity_type"], pdf["norm_name"]
            ):
                keys = set()
                for tok in (norm or "").split():
                    keys.add(f"{etype}|t:{tok}")
                    keys.add(f"{etype}|s:{soundex(tok)}")
                    for i in range(len(tok) - 3):
                        keys.add(f"{etype}|g:{tok[i:i + 4]}")
                for k in keys:
                    out.append((k, eid))
            yield pd.DataFrame(out, columns=["block_key", "entity_id"])

    return normed.mapInPandas(gen_keys, schema="block_key string, entity_id string")


def candidate_pairs(
    entities: DataFrame, config: PipelineConfig | None = None
) -> DataFrame:
    """Blocked self-join → distinct (id1, id2) with id1 < id2, each carrying
    the columns the scorer needs."""
    config = config or PipelineConfig()
    keys = blocking_keys(entities)

    # drop oversized blocks (Zipf-hot tokens) — the skew guard
    key_counts = keys.groupBy("block_key").agg(F.count(F.lit(1)).alias("cnt"))
    good_keys = key_counts.where(
        (F.col("cnt") > 1) & (F.col("cnt") <= config.max_block_size)
    ).select("block_key")
    keys = keys.join(good_keys, "block_key")

    left = keys.select("block_key", F.col("entity_id").alias("id1"))
    right = keys.select("block_key", F.col("entity_id").alias("id2"))
    # multi-pass blocking: keep only pairs sharing >= min_shared_blocks
    # keys (true near-dups share many; the junk majority shares one) —
    # the groupBy count replaces the plain distinct at the same cost
    pairs = (
        left.join(right, "block_key")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("_nk"))
        .where(F.col("_nk") >= config.min_shared_blocks)
        .select("id1", "id2")
    )

    meta = entities.select(
        "entity_id",
        "entity_type",
        normalize_name_col(F.col("name")).alias("norm_name"),
    )
    return (
        pairs.join(
            meta.select(
                F.col("entity_id").alias("id1"),
                F.col("entity_type").alias("type1"),
                F.col("norm_name").alias("norm1"),
            ),
            "id1",
        )
        .join(
            meta.select(
                F.col("entity_id").alias("id2"),
                F.col("entity_type").alias("type2"),
                F.col("norm_name").alias("norm2"),
            ),
            "id2",
        )
    )


def score_pairs(pairs: DataFrame, config: PipelineConfig | None = None) -> DataFrame:
    """Exact reference metric suite per pair; keeps score ≥ threshold."""
    config = config or PipelineConfig()
    threshold = config.link_min_similarity
    max_ed = config.link_max_edit_distance
    use_phonetic = config.link_use_phonetic
    fuzzy = config.link_fuzzy_matching

    def score_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.similarity import pair_similarity

        for pdf in batches:
            out = []
            for id1, id2, t1, t2, n1, n2 in zip(
                pdf["id1"], pdf["id2"], pdf["type1"], pdf["type2"],
                pdf["norm1"], pdf["norm2"],
            ):
                s = pair_similarity(
                    n1, n2, t1, t2,
                    max_edit_distance=max_ed,
                    use_phonetic=use_phonetic,
                    fuzzy_matching=fuzzy,
                    pre_normalized=True,
                )
                if s >= threshold:
                    out.append((id1, id2, s))
            yield pd.DataFrame(out, columns=["id1", "id2", "score"])

    return pairs.mapInPandas(score_batches, schema=PAIR_SCORE_SCHEMA)


def _greedy_replay_udf(config: PipelineConfig):
    """Per-component exact greedy clustering (linker rs:79-103 semantics)."""
    threshold = config.link_min_similarity
    max_ed = config.link_max_edit_distance
    use_phonetic = config.link_use_phonetic
    fuzzy = config.link_fuzzy_matching

    def _greedy_scan(
        order: list[int],
        ids: list[str],
        norms: list[str],
        types: list[str],
        confs: list[float],
        out_rows: list[tuple[str, str]],
    ) -> None:
        from graphrag_rs_spark.rules.similarity import pair_similarity

        clustered: set[int] = set()
        for a, i in enumerate(order):
            if i in clustered:
                continue
            cluster = [i]
            clustered.add(i)
            for j in order[a + 1:]:
                if j in clustered:
                    continue
                sim = pair_similarity(
                    norms[i], norms[j], types[i], types[j],
                    max_edit_distance=max_ed,
                    use_phonetic=use_phonetic,
                    fuzzy_matching=fuzzy,
                    pre_normalized=True,
                )
                if sim >= threshold:
                    cluster.append(j)
                    clustered.add(j)
            canon = max(cluster, key=lambda k: (confs[k], ids[k]))
            for k in cluster:
                out_rows.append((ids[k], ids[canon]))

    def greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        n = len(pdf)
        out_rows: list[tuple[str, str]] = []
        order = sorted(
            range(n),
            key=lambda i: (
                pdf["conv_id"].iat[i], int(pdf["chunk_idx"].iat[i]),
                int(pdf["rank"].iat[i]), pdf["entity_id"].iat[i],
            ),
        )
        ids = pdf["entity_id"].tolist()
        norms = pdf["norm_name"].tolist()
        types = pdf["entity_type"].tolist()
        confs = pdf["confidence"].tolist()

        if n > MAX_COMPONENT_GREEDY:
            # Re-block the oversized component by a stronger key (type +
            # first normalized-name token): high-similarity pairs virtually
            # always share a leading token at this component size, and each
            # sub-block replays greedily on its own — Σ O(nᵢ²) instead of
            # one O(n²) straggler task. Sub-blocks still above the cap
            # collapse to a single cluster (bounded worst case).
            sub_blocks: dict[tuple[str, str], list[int]] = {}
            for i in order:
                tok = (norms[i] or "").split(" ", 1)[0]
                sub_blocks.setdefault((types[i], tok), []).append(i)
            for members in sub_blocks.values():
                if len(members) > MAX_COMPONENT_GREEDY:
                    canon = max(members, key=lambda k: (confs[k], ids[k]))
                    out_rows.extend((ids[k], ids[canon]) for k in members)
                else:
                    _greedy_scan(members, ids, norms, types, confs, out_rows)
            return pd.DataFrame(out_rows, columns=["entity_id", "cluster_id"])

        _greedy_scan(order, ids, norms, types, confs, out_rows)
        return pd.DataFrame(out_rows, columns=["entity_id", "cluster_id"])

    return greedy


def canonicalize_entities(
    entities: DataFrame, config: PipelineConfig | None = None
) -> DataFrame:
    """entities_raw → clusters(entity_id, cluster_id, canonical_name,
    entity_type, confidence, member_count).

    ``cluster_id`` is the canonical member's entity_id (the reference's
    links map points every member at the canonical id, rs:117-124);
    singletons map to themselves without touching the greedy UDF.
    """
    config = config or PipelineConfig()
    pairs = candidate_pairs(entities, config)
    # matches is TINY (pairs above threshold) but expensive to produce
    # (blocking UDF + scoring UDF + joins); checkpoint it eagerly — the CC
    # strategy probe, the CC itself, and the member join each trigger an
    # action and would otherwise re-run the whole candidate chain
    matches = score_pairs(pairs, config).localCheckpoint(eager=True)

    cc = connected_components(matches, src="id1", dst="id2").localCheckpoint(
        eager=True
    )

    # only component members go through the greedy replay (tiny minority)
    members = entities.join(cc, entities["entity_id"] == cc["id"]).select(
        "entity_id",
        normalize_name_col(F.col("name")).alias("norm_name"),
        "entity_type",
        "confidence",
        F.col("order_key.conv_id").alias("conv_id"),
        F.col("order_key.chunk_idx").alias("chunk_idx"),
        F.col("order_key.rank").alias("rank"),
        "component",
    )
    assigned = members.groupBy("component").applyInPandas(
        _greedy_replay_udf(config), schema=CLUSTER_ASSIGN_SCHEMA
    )

    with_cluster = entities.join(assigned, "entity_id", "left").select(
        "entity_id",
        "name",
        "entity_type",
        "confidence",
        F.coalesce("cluster_id", F.col("entity_id")).alias("cluster_id"),
    )

    canonical = with_cluster.groupBy("cluster_id").agg(
        F.max_by("name", F.struct("confidence", "entity_id")).alias("_canonical_name"),
        F.max("confidence").alias("cluster_confidence"),
        F.count(F.lit(1)).alias("member_count"),
    )

    return (
        with_cluster.join(canonical, "cluster_id")
        .select(
            "entity_id",
            "cluster_id",
            F.col("_canonical_name").alias("canonical_name"),
            "entity_type",
            "confidence",
            "cluster_confidence",
            "member_count",
        )
    )
