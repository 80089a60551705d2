"""Adaptive retrieval: query analysis, strategy weighting, fusion
(retrieval/mod.rs:600-905, retrieval/adaptive.rs; rule twins in
rules/adaptive.py).

Spark shapes, sized for a 100 TB graph:

* ``analyze_queries`` — the reference scans EVERY graph entity per query
  (mod.rs:605-614). Distributed: the query batch (small, bounded) is
  broadcast against the entity table, so entity detection is ONE
  streamed pass over the big side with no shuffle of entities; matched
  names roll up per query with a ``sort_array(collect_list(...))``
  pinned to the entity table's deterministic order column. Everything
  downstream of the entity list (concepts, type, intent, complexity) is
  pure JVM higher-order/array expressions — no UDF.
* ``strategy_weights`` / ``adaptive_strategy_weights`` — when-ladders
  over the analysis columns (mod.rs:895-905, adaptive.rs:55-87,195-209).
* ``fuse_adaptive`` — per-query fusion: the dedupe-keep-max reduces to a
  window (max score per id, earliest occurrence of that max), the
  rank to a sort, both distributed; the DIVERSITY pass is an inherently
  sequential ~max_results-long loop per query, so it runs as
  ``applyInPandas`` over the rule twin — one Arrow batch per query,
  bounded by the candidate count, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.rules.adaptive import (
    ABSTRACT_INDICATORS,
    ADAPTIVE_STOP_WORDS,
    ADAPTIVE_WEIGHT_TABLES,
    CAUSAL_WORDS,
    COMPARATIVE_WORDS,
    DETAILED_WORDS,
    MIN_CONFIDENCE_FOR_SPECIALIZATION,
    OVERVIEW_WORDS,
    QUESTION_WORDS,
    TEMPORAL_WORDS,
)

ANALYSIS_COLS = ("query_type", "key_entities", "concepts", "intent",
                 "complexity_score")


def analyze_queries(
    queries: DataFrame,
    entities: DataFrame,
    query_col: str = "query",
    name_col: str = "name",
) -> DataFrame:
    """retrieval/mod.rs:600-684 over a query batch × entity table.

    Output adds ``query_type`` / ``key_entities`` / ``concepts`` /
    ``intent`` / ``complexity_score``. ``key_entities`` is sorted by
    name (the reference preserves graph iteration order, which has no
    distributed analogue; counts and containment semantics — all that
    downstream logic reads — are order-independent).
    """
    # array_remove(…, "") mirrors Python's "".split() == [] — without it
    # an empty/whitespace-only query tokenizes as [""], and contains("")
    # is true for EVERY entity name: the broadcast join would roll the
    # whole entity table's names into that one query's key_entities
    words_col = F.array_remove(
        F.split(F.lower(F.trim(F.col(query_col))), r"\s+"), ""
    )
    q = queries.withColumn("_words", words_col)

    # entity detection: broadcast the (small) query batch, stream the
    # entity table once; non-equi containment either direction
    ent = entities.select(F.col(name_col).alias("_ename")).where(
        F.col("_ename").isNotNull()
    ).distinct().withColumn("_ename_l", F.lower(F.col("_ename")))
    qw = q.select(query_col, "_words")
    matched = ent.join(
        F.broadcast(qw),
        F.exists(
            F.col("_words"),
            lambda w: F.col("_ename_l").contains(w)
            | w.contains(F.col("_ename_l")),
        ),
        "inner",
    ).groupBy(query_col).agg(
        F.sort_array(F.collect_set("_ename")).alias("key_entities")
    )

    out = q.join(matched, query_col, "left").withColumn(
        "key_entities",
        F.coalesce(F.col("key_entities"), F.array().cast("array<string>")),
    )

    key_lower = F.transform(F.col("key_entities"), F.lower)
    concepts = F.filter(
        F.col("_words"),
        lambda w: (F.length(w) > 3)
        & ~w.isin(*sorted(ADAPTIVE_STOP_WORDS))
        & ~F.exists(key_lower, lambda e: e.contains(w) | w.contains(e)),
    )
    out = out.withColumn("concepts", concepts)

    def _any_word(word_list) -> F.Column:
        return F.arrays_overlap(
            F.col("_words"), F.array(*[F.lit(w) for w in word_list]))

    n_ents = F.size("key_entities")
    query_type = (
        F.when(n_ents > 1, F.lit("relationship"))
        .when(n_ents > 0, F.lit("entity_focused"))
        .when(_any_word(ABSTRACT_INDICATORS), F.lit("conceptual"))
        .when(_any_word(QUESTION_WORDS), F.lit("exploratory"))
        .otherwise(F.lit("factual"))
    )
    intent = (
        F.when(_any_word(OVERVIEW_WORDS), F.lit("overview"))
        .when(_any_word(DETAILED_WORDS), F.lit("detailed"))
        .when(_any_word(COMPARATIVE_WORDS), F.lit("comparative"))
        .when(_any_word(CAUSAL_WORDS), F.lit("causal"))
        .when(_any_word(TEMPORAL_WORDS), F.lit("temporal"))
        .otherwise(F.lit("detailed"))
    )
    complexity = F.least(
        F.size("_words") * 0.1 + n_ents * 0.3 + F.size("concepts") * 0.2,
        F.lit(1.0),
    )
    return (
        out.withColumn("query_type", query_type)
        .withColumn("intent", intent)
        .withColumn("complexity_score", complexity)
        .drop("_words")
    )


def strategy_weights(analyzed: DataFrame) -> DataFrame:
    """retrieval/mod.rs:895-905 — adds (vector/graph/hierarchical)_weight
    from ``query_type`` × ``intent``."""
    qt, it = F.col("query_type"), F.col("intent")
    table = [
        (qt == "entity_focused", (0.5, 0.4, 0.1)),
        (qt == "relationship", (0.3, 0.6, 0.1)),
        ((qt == "conceptual") & (it == "overview"), (0.2, 0.2, 0.6)),
        (qt == "conceptual", (0.4, 0.3, 0.3)),
        ((qt == "exploratory") & (it == "overview"), (0.3, 0.2, 0.5)),
        (qt == "exploratory", (0.4, 0.4, 0.2)),
    ]
    cols = []
    for i, name in enumerate(("vector_weight", "graph_weight",
                              "hierarchical_weight")):
        expr = None
        for cond, tup in table:
            expr = (F.when(cond, F.lit(tup[i])) if expr is None
                    else expr.when(cond, F.lit(tup[i])))
        default = (0.6, 0.3, 0.1)[i]  # factual
        cols.append(expr.otherwise(F.lit(default)).alias(name))
    return analyzed.select("*", *cols)


def adaptive_strategy_weights(
    analyzed: DataFrame,
    confidence_col: str = "complexity_score",
    min_confidence: float = MIN_CONFIDENCE_FOR_SPECIALIZATION,
) -> DataFrame:
    """retrieval/adaptive.rs:195-209 — the 4-weight tables gated on
    confidence (< ``min_confidence`` → balanced complex weights)."""
    qt = F.col("query_type")
    low = F.col(confidence_col) < F.lit(float(min_confidence))
    names = ("vector_weight", "graph_weight", "hierarchical_weight",
             "bm25_weight")
    complex_w = ADAPTIVE_WEIGHT_TABLES["exploratory"]
    cols = []
    for i, name in enumerate(names):
        expr = F.when(low, F.lit(complex_w[i]))
        for t, tup in ADAPTIVE_WEIGHT_TABLES.items():
            expr = expr.when(qt == t, F.lit(tup[i]))
        cols.append(expr.otherwise(F.lit(complex_w[i])).alias(name))
    return analyzed.select("*", *cols)


FUSED_SCHEMA = (
    "query string, id string, score double, entities array<string>, "
    "final_rank int"
)


def fuse_adaptive(
    candidates: DataFrame,
    max_results: int = 10,
    query_col: str = "query",
    id_col: str = "id",
    score_col: str = "score",
    entities_col: str = "entities",
) -> DataFrame:
    """retrieval/adaptive.rs:220-298 over a many-query candidate table:
    weighted scores are assumed already applied (rs:212-217 is a simple
    multiply done by the caller per strategy). Dedupe keeps the highest
    scored copy per id; ranking sorts score desc; the diversity loop
    runs per query through the rule twin (bounded candidates/query).

    Encounter order matters to the reference's dedupe/tie behavior (the
    strategies extend one Vec in vector→graph→hierarchical→bm25 order);
    a distributed group has no inherent order, so rows are replayed by
    the ``_ord`` column when the caller provides one, else by
    (-score, id) as a deterministic stand-in."""

    has_ord = "_ord" in candidates.columns
    sel = [query_col, id_col, score_col, entities_col] + (
        ["_ord"] if has_ord else [])

    def select_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        from graphrag_rs_spark.rules.adaptive import (
            Candidate,
            cross_strategy_fusion,
        )

        if has_ord:
            pdf = pdf.sort_values("_ord", kind="stable")
        else:
            pdf = pdf.sort_values(
                [score_col, id_col], ascending=[False, True],
                kind="stable")
        def _ents(v):
            # Arrow list columns arrive as numpy arrays, whose truth
            # value is ambiguous for length ≥ 2 (`v or ()` crashes);
            # nulls arrive as None (or NaN on some pandas paths)
            if v is None or isinstance(v, float):
                return ()
            return tuple(v)

        cands = [
            Candidate(str(r[id_col]), float(r[score_col]),
                      _ents(r[entities_col]))
            for _, r in pdf.iterrows()
        ]
        chosen = cross_strategy_fusion(cands, max_results)
        return pd.DataFrame(
            [
                (pdf[query_col].iloc[0], c.id, c.score, list(c.entities),
                 i + 1)
                for i, c in enumerate(chosen)
            ],
            columns=["query", "id", "score", "entities", "final_rank"],
        )

    return (
        candidates.select(*sel)
        .groupBy(query_col)
        .applyInPandas(select_group, schema=FUSED_SCHEMA)
    )
