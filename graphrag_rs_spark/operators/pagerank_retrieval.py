"""PageRank-enhanced retrieval (reference: retrieval/pagerank_retrieval.rs,
the "fast-GraphRAG" search path).

Per query the reference runs (pagerank_retrieval.rs:134-226):

1. **lexical entity scoring** (:228-277) — duplicate-counting Jaccard
   between the query words and ``"{name} {type}"`` words, kept only when
   the similarity exceeds 0.1, PLUS a flat 0.3 bonus per entity mention
   whose chunk text contains the whole query substring (the bonus inserts
   a score even when the Jaccard arm was below threshold — quirk kept).
2. the scores, sum-normalized (:297-311), become the PPR reset
   distribution (:279-295) — our existing weighted-reset
   :func:`~graphrag_rs_spark.operators.retrieval.pagerank`.
3. combine ``vector_weight·lex + pagerank_weight·ppr`` over the union of
   both key sets (graph/pagerank.rs:536-562; the chunk/relationship arms
   are dead weights — ``get_entity_chunk_score`` hard-returns 0.0), drop
   rows below ``min_score_threshold`` (:168).
4. expand each surviving entity to every chunk that mentions it; an
   entity with no chunk emits one fallback row with chunk_id
   ``entity_{id}`` and content ``"{name}: {type}"`` (:172-214).
5. sort by score desc, truncate (:217-218). The rust sort is unstable on
   ties; ours tie-breaks (entity_id, chunk_id) asc for determinism.

Spark shape: the query string is a driver literal, so step 1 is one
whole-stage-codegen pass over the entity table plus one broadcast-joined
mention/chunk count — no Python in the pipeline. The PPR is the shared
one-action-per-iteration operator. Scale notes: everything shuffles on
entity_id / chunk_id only; the per-query cost is the PPR's iteration
count, exactly as the reference's per-query ``calculate_scores``.
``global_pagerank_scores`` ports the precompute path (:366-381) — at
batch scale, rank once and reuse across queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.operators.retrieval import pagerank

__all__ = [
    "lexical_entity_scores",
    "pagerank_search",
    "quick_entity_search",
    "global_pagerank_scores",
]


def _words(col):
    # split_whitespace over the lowered text (rs:238,246)
    from graphrag_rs_spark.functions import ws_tokens

    return ws_tokens(F.lower(col))


def lexical_entity_scores(
    entities: DataFrame,
    mentions: DataFrame,
    chunks: DataFrame,
    query: str,
    id_col: str = "id",
    name_col: str = "name",
    type_col: str = "entity_type",
    entity_col: str = "entity_id",
    chunk_col: str = "chunk_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, vector_score) — pagerank_retrieval.rs:228-277.

    Jaccard counts every query-word OCCURRENCE found among the entity's
    words (rs:249-252 filters the query vector, so duplicates in the query
    each count); union = |q| + |e| − inter over the raw (duplicated)
    lengths. Mention bonus: +0.3 for EVERY mention row whose chunk text
    contains the query substring (rs:264-273 — per mention, not per
    chunk)."""
    q_lower = query.lower()
    q_words = q_lower.split()
    qw = F.array(*[F.lit(w) for w in q_words]) if q_words else F.array()
    ew = _words(F.concat_ws(" ", F.col(name_col), F.col(type_col)))
    inter = F.size(F.filter(qw, lambda w: F.array_contains(ew, w)))
    union = F.lit(len(q_words)) + F.size(ew) - inter
    sim = inter.cast("double") / union
    jaccard = entities.select(
        F.col(id_col).alias("id"),
        F.when((inter > 0) & (sim > 0.1), sim)
        .otherwise(F.lit(0.0))
        .alias("_jac"),
    )
    matching_chunks = chunks.where(
        F.contains(F.lower(F.col(text_col)), F.lit(q_lower))
    ).select(F.col(chunk_col).alias("_mc"))
    bonus = (
        mentions.join(
            F.broadcast(matching_chunks),
            mentions[chunk_col] == F.col("_mc"),
        )
        .groupBy(F.col(entity_col).alias("id"))
        .agg((F.count(F.lit(1)) * F.lit(0.3)).alias("_bonus"))
    )
    return (
        jaccard.join(bonus, "id", "left")
        .select(
            "id",
            (F.col("_jac") + F.coalesce("_bonus", F.lit(0.0))).alias(
                "vector_score"
            ),
        )
        .where(F.col("vector_score") > 0.0)
    )


def global_pagerank_scores(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1.0e-6,
) -> DataFrame:
    """Uniform-teleport PageRank over the whole graph — the reference's
    ``precompute_global_pagerank`` (:366-381, empty reset map ⇒ uniform).
    Rank once, broadcast-reuse across a query batch."""
    return pagerank(
        edges, src=src, dst=dst, damping=damping, max_iter=max_iter, tol=tol
    )


def pagerank_search(
    entities: DataFrame,
    edges: DataFrame,
    mentions: DataFrame,
    chunks: DataFrame,
    query: str,
    max_results: int = 10,
    vector_weight: float = 0.3,
    pagerank_weight: float = 0.4,
    min_score_threshold: float = 0.1,
    damping: float = 0.85,
    max_iter: int = 20,
    id_col: str = "id",
    name_col: str = "name",
    type_col: str = "entity_type",
    src: str = "subj",
    dst: str = "obj",
    entity_col: str = "entity_id",
    chunk_col: str = "chunk_id",
    text_col: str = "text",
) -> DataFrame:
    """Full search (rs:134-226). Returns
    (entity_id, chunk_id, content, score, vector_score, pagerank_score).

    Default weights 0.3/0.4 are ScoreWeights::default (graph/
    pagerank.rs:513-521; the chunk/relationship weights multiply a
    hard-coded 0.0); min threshold 0.1 and damping 0.85 are the system
    defaults (pagerank_retrieval.rs:59-74)."""
    lex = lexical_entity_scores(
        entities,
        mentions,
        chunks,
        query,
        id_col=id_col,
        name_col=name_col,
        type_col=type_col,
        entity_col=entity_col,
        chunk_col=chunk_col,
        text_col=text_col,
    ).localCheckpoint(eager=False)

    # empty lexical scores ⇒ empty result, PPR skipped (rs:148-150)
    if lex.limit(1).count() == 0:
        return lex.sparkSession.createDataFrame(
            [],
            "entity_id string, chunk_id string, content string, "
            "score double, vector_score double, pagerank_score double",
        )

    reset = lex.select("id", F.col("vector_score").alias("weight"))
    ppr = pagerank(
        edges,
        src=src,
        dst=dst,
        damping=damping,
        max_iter=max_iter,
        personalization=reset,
    )

    # union of both key sets (graph/pagerank.rs:542-547); absent side = 0
    combined = (
        lex.join(ppr, "id", "full_outer")
        .select(
            "id",
            F.coalesce("vector_score", F.lit(0.0)).alias("vector_score"),
            F.coalesce("rank", F.lit(0.0)).alias("pagerank_score"),
        )
        .withColumn(
            "score",
            F.lit(vector_weight) * F.col("vector_score")
            + F.lit(pagerank_weight) * F.col("pagerank_score"),
        )
        .where(F.col("score") >= F.lit(min_score_threshold))
    )

    ent_info = entities.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("_name"),
        F.col(type_col).alias("_type"),
    )
    memberships = (
        mentions.select(
            F.col(entity_col).alias("id"), F.col(chunk_col).alias("chunk_id")
        )
        .distinct()
        .join(
            chunks.select(
                F.col(chunk_col).alias("chunk_id"),
                F.col(text_col).alias("_chunk_text"),
            ),
            "chunk_id",
        )
    )
    expanded = combined.join(memberships, "id", "left").join(
        ent_info, "id", "left"
    )
    return (
        expanded.select(
            F.col("id").alias("entity_id"),
            F.coalesce(
                F.col("chunk_id"), F.concat(F.lit("entity_"), F.col("id"))
            ).alias("chunk_id"),
            F.coalesce(
                F.col("_chunk_text"),
                F.concat_ws(": ", F.col("_name"), F.col("_type")),
            ).alias("content"),
            "score",
            "vector_score",
            "pagerank_score",
        )
        .orderBy(F.desc("score"), "entity_id", "chunk_id")
        .limit(max_results)
    )


def quick_entity_search(
    entities: DataFrame,
    entity_name: str,
    max_results: int = 10,
    id_col: str = "id",
    name_col: str = "name",
    type_col: str = "entity_type",
) -> DataFrame:
    """Name-substring lookup (rs:329-363): exact lowercase match scores
    1.0, substring match 0.8; content is ``"{name}: {type}"``, chunk_id
    the ``entity_{id}`` placeholder. Tie-break entity_id asc (rust sort
    unstable)."""
    n_lower = entity_name.lower()
    name_lc = F.lower(F.col(name_col))
    score = F.when(name_lc == F.lit(n_lower), F.lit(1.0)).otherwise(
        F.lit(0.8)
    )
    return (
        entities.where(F.contains(name_lc, F.lit(n_lower)))
        .select(
            F.col(id_col).alias("entity_id"),
            F.concat(F.lit("entity_"), F.col(id_col)).alias("chunk_id"),
            F.concat_ws(": ", F.col(name_col), F.col(type_col)).alias(
                "content"
            ),
            score.alias("score"),
            score.alias("vector_score"),
            F.lit(0.0).alias("pagerank_score"),
        )
        .orderBy(F.desc("score"), "entity_id")
        .limit(max_results)
    )
