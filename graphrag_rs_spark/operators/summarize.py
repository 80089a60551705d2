"""Hierarchical summarization tree (graphrag-rs summarization/mod.rs:
271-757) as distributed level-wise aggregation.

The reference builds one in-memory tree per corpus: leaves are chunks in
order; each level groups ``merge_size`` consecutive nodes, concatenates
their content with blank lines, merges/dedups/truncates keywords to 10,
and summarizes the combined content (extractive scorer when the LLM is
disabled — our deterministic path, rules/summarize.py). Node ids follow
``level_{level}_{counter}`` (mod.rs:663-665).

Spark shape: the tree is a DataFrame of nodes ``(doc_id, level, node_idx,
node_id, content, summary, keywords, chunk_ids)`` built per document —
``Window.partitionBy(doc_id)`` assigns group numbers, one ``groupBy``
per level merges; the driver loop runs ``ceil(log_merge(max_leaves))``
iterations (a config-bounded constant, not data-dependent, since chunk
counts per conversation are bounded by assembly). All per-doc trees build
concurrently in one job per level — no per-document driver work.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NODE_SCHEMA = (
    "doc_id string, level int, node_idx bigint, node_id string, "
    "content string, summary string, keywords array<string>, "
    "chunk_ids array<string>"
)


def _summarize_batches(max_summary_length: int):
    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from graphrag_rs_spark.rules.summarize import extractive_summary

        for pdf in batches:
            pdf = pdf.copy()
            pdf["summary"] = [
                extractive_summary(c or "", max_summary_length)
                for c in pdf["content"]
            ]
            yield pdf

    return run


def build_summary_tree(
    chunks: DataFrame,
    doc_col: str = "doc_id",
    order_col: str = "chunk_idx",
    text_col: str = "text",
    id_col: str = "chunk_id",
    merge_size: int = 5,
    max_summary_length: int = 200,
    keywords_per_node: int = 10,
    max_levels: int = 12,
) -> DataFrame:
    """chunks → tree-node DataFrame (all levels unioned).

    Level 0 nodes are the chunks themselves (summary = extractive summary
    of the chunk, mod.rs:383); level L+1 merges each run of ``merge_size``
    consecutive level-L nodes per document until one root per doc remains.
    Keywords at leaves are the reference's TF keywords; merged nodes union
    + sort + dedup + truncate to 10 (mod.rs:710-713).
    """
    from graphrag_rs_spark.operators.retrieval import keywords_tf

    w = Window.partitionBy(doc_col).orderBy(order_col)
    kw = keywords_tf(chunks, text_col=text_col, id_col=id_col, max_keywords=keywords_per_node)
    kw_agg = kw.groupBy(id_col).agg(
        F.array_sort(F.collect_list("word")).alias("keywords")
    )
    leaves = (
        chunks.join(kw_agg, id_col, "left")
        .select(
            F.col(doc_col).alias("doc_id"),
            F.lit(0).alias("level"),
            (F.row_number().over(w) - 1).cast("bigint").alias("node_idx"),
            F.col(id_col).alias("node_id"),
            F.col(text_col).alias("content"),
            F.coalesce("keywords", F.array().cast("array<string>")).alias("keywords"),
            F.array(F.col(id_col)).alias("chunk_ids"),
        )
        .withColumn("summary", F.lit(""))
        .select(
            "doc_id", "level", "node_idx", "node_id", "content", "summary",
            "keywords", "chunk_ids",
        )
        .mapInPandas(_summarize_batches(max_summary_length), schema=NODE_SCHEMA)
    )

    levels = [leaves.localCheckpoint(eager=True)]
    current = levels[0]
    for level in range(1, max_levels + 1):
        # only documents still holding >1 node at this level keep merging;
        # a doc whose single node is already its root stops here (the
        # reference builds each doc's tree independently)
        active_docs = (
            current.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        if active_docs.isEmpty():
            break
        grouped = current.join(active_docs, "doc_id", "left_semi").withColumn(
            "grp", F.floor(F.col("node_idx") / merge_size)
        )
        merged = (
            grouped.groupBy("doc_id", "grp")
            .agg(
                F.concat_ws(
                    "\n\n", F.array_sort(F.collect_list(F.struct("node_idx", "content")))
                    .getField("content")
                ).alias("content"),
                F.slice(
                    F.array_sort(F.array_distinct(F.flatten(F.collect_list("keywords")))),
                    1, keywords_per_node,
                ).alias("keywords"),
                F.flatten(
                    F.array_sort(F.collect_list(F.struct("node_idx", "chunk_ids")))
                    .getField("chunk_ids")
                ).alias("chunk_ids"),
            )
            .select(
                "doc_id",
                F.lit(level).alias("level"),
                F.col("grp").cast("bigint").alias("node_idx"),
                F.concat(
                    F.lit(f"level_{level}_"), F.col("grp").cast("string")
                ).alias("node_id"),
                "content",
                F.lit("").alias("summary"),
                "keywords",
                "chunk_ids",
            )
            .mapInPandas(_summarize_batches(max_summary_length), schema=NODE_SCHEMA)
            .localCheckpoint(eager=True)
        )
        levels.append(merged)
        current = merged

    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out


def query_tree(
    tree: DataFrame, query: str, max_results: int = 10
) -> DataFrame:
    """Keyword-relevance query over tree nodes
    (summarization/mod.rs:867-932), entirely JVM-side:

    score = Σ_keywords [node_text contains kw]
          + 2 · |query words ∩ node words| / |query words|
          + 0.5 / (level + 1)

    where query keywords are the reference TF keyword extraction of the
    query (top 5) and node_text = lower(summary + " " + keywords). Nodes
    with score > 0.1, sorted desc (tie: node_id asc — the reference's
    partial_cmp sort is tie-unstable), top ``max_results``.
    """
    from collections import Counter

    from graphrag_rs_spark.operators.retrieval import KEYWORD_STOPWORDS

    toks = [
        w for w in query.lower().split()
        if len(w) > 3 and w not in KEYWORD_STOPWORDS
    ]
    counts = Counter(toks)
    qkeywords = [w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    qwords = query.split()

    node_text = F.lower(
        F.concat_ws(" ", F.col("summary"), F.concat_ws(" ", F.col("keywords")))
    )
    node_words = F.split(node_text, r"\s+")

    kw_score = sum(
        (F.when(node_text.contains(kw.lower()), F.lit(1.0)).otherwise(F.lit(0.0))
         for kw in qkeywords),
        F.lit(0.0),
    )
    if qwords:
        overlap = sum(
            (F.when(F.array_contains(node_words, w.lower()), F.lit(1)).otherwise(F.lit(0))
             for w in qwords),
            F.lit(0),
        )
        word_score = overlap.cast("double") / F.lit(float(len(qwords))) * F.lit(2.0)
    else:
        word_score = F.lit(0.0)
    level_score = F.lit(0.5) / (F.col("level") + 1)
    score = kw_score + word_score + level_score

    return (
        tree.withColumn("score", score)
        .where(F.col("score") > 0.1)
        .orderBy(F.desc("score"), F.asc("node_id"))
        .limit(max_results)
        .select("doc_id", "node_id", "level", "score", "summary", "keywords",
                "chunk_ids")
    )


def tree_roots(tree: DataFrame) -> DataFrame:
    """One root row per document: the single node at each doc's max level."""
    w = Window.partitionBy("doc_id").orderBy(F.desc("level"), F.asc("node_idx"))
    return tree.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
