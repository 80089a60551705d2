"""ROGRAG query processing over Spark (reference rograg/ feature).

The reference processes ONE query at a time against an in-memory graph
(processor.rs). The Spark-first re-expression is BATCH-oriented: a
DataFrame of queries is classified / decomposed / parsed with one
Arrow-batched pass (pure-Python rules from rules/rograg.py — cheap,
per-row, no graph access), while the graph-touching steps (fuzzy entity
matching, logic-form execution) become broadcast joins against the
distributed nodes/edges/chunks tables — the graph side stays partitioned
and is never collected:

* ``classify_intents``      — intent_classifier.rs:450-533 per query row
* ``decompose_queries``     — decomposer.rs (hybrid strategy) per query row
* ``parse_logic_forms``     — logic_form.rs:504-547 per query row
* ``fuzzy_match_entities``  — fuzzy_matcher.rs:368-426: queries ⋈ nodes
  with the 0.4·Jaccard + 0.4·containment + 0.2·Levenshtein similarity
  computed ENTIRELY in JVM expressions (split → array ops +
  ``F.levenshtein``), then a per-query top-k window. The query side is
  broadcast (queries ≪ nodes); nodes scan stays distributed.
* ``execute_logic_forms``   — logic_form.rs:587-721: Is/Related/Compare
  executed as joins per predicate group, unioned.

At 100 TB the nodes table is huge and the query batch is small: every
operator here is a broadcast-nested-loop or broadcast-hash join over the
big side with no all-pairs stage and no driver-side graph.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INTENT_SCHEMA = (
    "query string, primary_intent string, confidence double, "
    "should_refuse boolean, refusal_reason string, "
    "suggested_reformulation string, complexity_score double"
)

DECOMPOSE_SCHEMA = (
    "query string, subquery_id string, subquery string, "
    "subquery_type string, priority double, strategy string, "
    "confidence double"
)

LOGIC_FORM_SCHEMA = (
    "query string, predicate string, var1 string, arg1 string, "
    "var2 string, arg2 string, query_type string, confidence double"
)


def classify_intents(queries: DataFrame, text_col: str = "query") -> DataFrame:
    """Batch intent classification (intent_classifier.rs:450-533)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.rograg import classify_intent

        for pdf in batches:
            rows = []
            for q in pdf[text_col]:
                r = classify_intent(q or "")
                rows.append(
                    (
                        q,
                        r.primary_intent,
                        float(r.confidence),
                        bool(r.should_refuse),
                        r.refusal_reason,
                        r.suggested_reformulation,
                        float(r.complexity_score),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "query",
                    "primary_intent",
                    "confidence",
                    "should_refuse",
                    "refusal_reason",
                    "suggested_reformulation",
                    "complexity_score",
                ],
            )

    return queries.select(F.col(text_col)).mapInPandas(run, schema=INTENT_SCHEMA)


def decompose_queries(
    queries: DataFrame, text_col: str = "query", strategy: str = "hybrid"
) -> DataFrame:
    """Batch decomposition; one row per subquery (decomposer.rs)."""
    if strategy not in ("semantic", "syntactic", "hybrid"):
        raise ValueError(f"unknown decomposition strategy: {strategy!r}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules import rograg as R

        fn = {
            "semantic": R.decompose_semantic,
            "syntactic": R.decompose_syntactic,
            "hybrid": R.decompose_hybrid,
        }[strategy]
        for pdf in batches:
            rows = []
            for q in pdf[text_col]:
                d = fn(q or "")
                for sub in d.subqueries:
                    rows.append(
                        (
                            q,
                            sub.id,
                            sub.text,
                            sub.query_type,
                            float(sub.priority),
                            d.strategy_used,
                            float(d.confidence),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "query",
                    "subquery_id",
                    "subquery",
                    "subquery_type",
                    "priority",
                    "strategy",
                    "confidence",
                ],
            )

    return queries.select(F.col(text_col)).mapInPandas(
        run, schema=DECOMPOSE_SCHEMA
    )


def parse_logic_forms(queries: DataFrame, text_col: str = "query") -> DataFrame:
    """Batch pattern-based logic-form parse; unparseable queries get a
    NULL predicate row (the processor's fallback trigger)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from graphrag_rs_spark.rules.rograg import parse_logic_form

        for pdf in batches:
            rows = []
            for q in pdf[text_col]:
                lf = parse_logic_form(q or "")
                if lf is None:
                    rows.append((q, None, None, None, None, None, None, None))
                    continue
                args = dict(lf.arguments)
                rows.append(
                    (
                        q,
                        lf.predicate,
                        "X",
                        args.get("X"),
                        "Y" if "Y" in args else None,
                        args.get("Y"),
                        lf.query_type,
                        float(lf.confidence),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "query", "predicate", "var1", "arg1",
                    "var2", "arg2", "query_type", "confidence",
                ],
            )

    return queries.select(F.col(text_col)).mapInPandas(
        run, schema=LOGIC_FORM_SCHEMA
    )


def _jvm_fuzzy_similarity(qcol, ncol):
    """fuzzy_matcher.rs:540-551 as JVM column expressions.

    Word sets via split on whitespace → array_distinct; Jaccard and
    containment from array_intersect sizes; Levenshtein via the built-in.
    Whole-stage-codegen throughout — no Python in the scan.

    ``array_remove(…, "")`` matches Python's ``"".split() == []``:
    without it an empty/whitespace-only string tokenizes as one empty
    token ([""]), scoring blank-vs-blank pairs 1.0 where the twin
    ``rules.rograg.fuzzy_text_similarity`` scores 0.6.
    """
    qw = F.array_remove(F.array_distinct(F.split(F.trim(qcol), r"\s+")), "")
    nw = F.array_remove(F.array_distinct(F.split(F.trim(ncol), r"\s+")), "")
    inter = F.size(F.array_intersect(qw, nw)).cast("double")
    union = (F.size(qw) + F.size(nw)).cast("double") - inter
    jaccard = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    smaller = F.least(F.size(qw), F.size(nw)).cast("double")
    containment = F.when(
        (F.size(qw) == 0) & (F.size(nw) == 0), F.lit(1.0)
    ).when(smaller > 0, inter / smaller).otherwise(F.lit(0.0))
    max_len = F.greatest(F.length(qcol), F.length(ncol))
    lev = F.when(max_len == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(qcol, ncol).cast("double") / max_len
    )
    return jaccard * 0.4 + containment * 0.4 + lev * 0.2


def fuzzy_match_entities(
    queries: DataFrame,
    nodes: DataFrame,
    text_col: str = "query",
    name_col: str = "name",
    type_col: str = "entity_type",
    id_col: str = "cluster_id",
    similarity_threshold: float = 0.6,
    max_matches: int = 10,
    boost_exact_matches: bool = True,
) -> DataFrame:
    """Entity arm of fuzzy_matcher.rs:368-426, batched over queries.

    Per (query, entity): exact-name rows score 1.0 (``ExactEntity``);
    otherwise the combined text similarity gates at the threshold and is
    scaled by 0.9 (``PartialEntity``); entity-type word-overlap rows ride
    along at 0.7 weight (``SemanticEntity``). Top ``max_matches`` per
    query by similarity (ties broken on entity id for determinism — the
    reference's sort is unstable on ties).

    Plan shape: broadcast(queries) ⋈ nodes (nested-loop), similarity in
    codegen, then one shuffle for the per-query top-k window. The nodes
    side never replicates; at 10^9 nodes this is a single scan.
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(text_col).alias("query"),
            F.lower(F.col(text_col)).alias("_q_lower"),
        ).distinct()
    )
    n = nodes.select(
        F.col(id_col).alias("entity_id"),
        F.col(name_col).alias("entity_name"),
        F.col(type_col).alias("match_entity_type"),
        F.lower(F.col(name_col)).alias("_n_lower"),
        F.lower(F.col(type_col)).alias("_t_lower"),
    )

    joined = n.crossJoin(q)
    exact_score = F.lit(1.0 if boost_exact_matches else 0.95)

    # entity-type word overlap (rs:410-422): |q_words ∩ {type}| / min(len)
    qw_list = F.split(F.trim("_q_lower"), r"\s+")  # raw word LIST
    type_hit = F.array_contains(qw_list, F.col("_t_lower"))

    # barrier: the combined similarity (splits + array_intersect +
    # levenshtein) is referenced by the score whens AND the downstream
    # branch filters; without compute_once its definition inlines into
    # every reference (measured split() x80 in the optimized plan)
    from graphrag_rs_spark.functions import compute_once

    joined = compute_once(
        joined,
        {
            "_sim": _jvm_fuzzy_similarity(F.col("_q_lower"), F.col("_n_lower")),
            "_type_overlap": F.when(
                type_hit,
                F.lit(1.0) / F.least(F.size(qw_list), F.lit(1)).cast("double"),
            ).otherwise(F.lit(0.0)),
        },
    )
    sim = F.col("_sim")
    type_overlap = F.col("_type_overlap")

    scored = joined.select(
        "query",
        "entity_id",
        "entity_name",
        "match_entity_type",
        F.when(F.col("_n_lower") == F.col("_q_lower"), exact_score)
        .when(sim >= similarity_threshold, sim * 0.9)
        .otherwise(F.lit(None))
        .alias("_name_sim"),
        F.when(type_overlap > 0.0, type_overlap * 0.7)
        .otherwise(F.lit(None))
        .alias("_type_sim"),
        F.when(F.col("_n_lower") == F.col("_q_lower"), F.lit("ExactEntity"))
        .otherwise(F.lit("PartialEntity"))
        .alias("_name_match_type"),
    )
    name_rows = scored.where(F.col("_name_sim").isNotNull()).select(
        "query",
        "entity_id",
        "entity_name",
        "match_entity_type",
        F.col("_name_sim").alias("similarity"),
        F.col("_name_match_type").alias("match_type"),
    )
    type_rows = scored.where(F.col("_type_sim").isNotNull()).select(
        "query",
        "entity_id",
        "entity_name",
        "match_entity_type",
        F.col("_type_sim").alias("similarity"),
        F.lit("SemanticEntity").alias("match_type"),
    )
    all_rows = name_rows.unionByName(type_rows)

    w = Window.partitionBy("query").orderBy(
        F.desc("similarity"), F.asc("entity_id"), F.asc("match_type")
    )
    return (
        all_rows.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_matches)
        .drop("_rk")
    )


def fuzzy_match_chunks(
    queries: DataFrame,
    chunks: DataFrame,
    text_col: str = "query",
    content_col: str = "text",
    id_col: str = "chunk_id",
    similarity_threshold: float = 0.6,
    max_matches: int = 10,
) -> DataFrame:
    """Chunk arm of fuzzy_matcher.rs:429-473: per (query, chunk) a direct
    content-similarity row (``ChunkContent``) when the combined metric
    reaches the threshold, plus a keyword-overlap row when
    |query_words ∩ chunk_words| / min(list lengths) ≥ 0.8·threshold.
    Same broadcast-queries ⋈ distributed-chunks shape as the entity arm.
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(text_col).alias("query"),
            F.lower(F.col(text_col)).alias("_q_lower"),
        ).distinct()
    )
    c = chunks.select(
        F.col(id_col).alias("chunk_id"),
        F.col(content_col).alias("content"),
        F.lower(F.col(content_col)).alias("_c_lower"),
    )
    joined = c.crossJoin(q)
    # word_overlap quirk (rs:627-639): denominator is min RAW LIST length
    qw = F.split(F.trim("_q_lower"), r"\s+")
    cw = F.split(F.trim("_c_lower"), r"\s+")
    inter = F.size(
        F.array_intersect(F.array_distinct(qw), F.array_distinct(cw))
    ).cast("double")

    # same compute_once barrier as the entity arm: sim/overlap feed score
    # whens and downstream branch filters over LONG chunk texts
    from graphrag_rs_spark.functions import compute_once

    joined = compute_once(
        joined,
        {
            "_sim": _jvm_fuzzy_similarity(F.col("_q_lower"), F.col("_c_lower")),
            "_overlap": F.when(
                F.least(F.size(qw), F.size(cw)) > 0,
                inter / F.least(F.size(qw), F.size(cw)).cast("double"),
            ).otherwise(F.lit(0.0)),
        },
    )
    sim = F.col("_sim")
    overlap = F.col("_overlap")

    scored = joined.select(
        "query",
        "chunk_id",
        "content",
        F.when(sim >= similarity_threshold, sim).alias("_content_sim"),
        F.when(overlap >= similarity_threshold * 0.8, overlap).alias("_kw_sim"),
    )
    content_rows = scored.where(F.col("_content_sim").isNotNull()).select(
        "query", "chunk_id", "content",
        F.col("_content_sim").alias("similarity"),
        F.lit("ChunkContent").alias("match_type"),
    )
    kw_rows = scored.where(F.col("_kw_sim").isNotNull()).select(
        "query", "chunk_id", "content",
        F.col("_kw_sim").alias("similarity"),
        F.lit("ChunkContent").alias("match_type"),
    )
    all_rows = content_rows.unionByName(kw_rows)
    w = Window.partitionBy("query").orderBy(
        F.desc("similarity"), F.asc("chunk_id")
    )
    return (
        all_rows.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_matches)
        .drop("_rk")
    )


def execute_logic_forms(
    logic_forms: DataFrame,
    nodes: DataFrame,
    edges: DataFrame,
    name_col: str = "name",
    type_col: str = "entity_type",
    id_col: str = "cluster_id",
) -> DataFrame:
    """Execute parsed logic forms against the graph (logic_form.rs:587-721).

    Grouped by predicate, each group becomes a join:

    * ``Is`` — entities whose lowercase name CONTAINS the argument
      (rs:604-631); binding value "name (type)", confidence =
      name-similarity (exact 1.0 / containment 0.8 / word-Jaccard).
    * ``Related`` — resolve both arguments to entities (exact-then-
      containment, rs:744-757), then look for a direct edge either
      direction (rs:634-680); no-edge pairs yield the reference's
      "No direct relationship found" binding at confidence 0.3.
    * ``Compare`` — resolve both, emit the type-comparison sentence at
      confidence 0.7 (rs:693-721).

    Returns (query, predicate, variable, value, entity_id, confidence).
    ``Happened``/``Caused``/``Has`` parse but execute to no bindings —
    the reference stubs them too (rs:682-741).
    """
    n = nodes.select(
        F.col(id_col).alias("entity_id"),
        F.col(name_col).alias("entity_name"),
        F.col(type_col).alias("match_entity_type"),
        F.lower(F.col(name_col)).alias("_n_lower"),
    )
    lf = F.broadcast(logic_forms.where(F.col("predicate").isNotNull()))

    # ---- Is ----
    is_q = lf.where(F.col("predicate") == "Is").select(
        "query", F.lower("arg1").alias("_a1")
    )
    qw = F.split("_a1", r"\s+")
    nw = F.split("_n_lower", r"\s+")
    inter = F.size(F.array_intersect(F.array_distinct(qw), F.array_distinct(nw)))
    union = (
        F.size(F.array_distinct(qw)) + F.size(F.array_distinct(nw)) - inter
    )
    name_sim = (
        F.when(F.col("_n_lower") == F.col("_a1"), F.lit(1.0))
        .when(
            F.col("_n_lower").contains(F.col("_a1"))
            | F.col("_a1").contains(F.col("_n_lower")),
            F.lit(0.8),
        )
        .otherwise(
            F.when(union > 0, inter.cast("double") / union.cast("double"))
            .otherwise(F.lit(0.0))
        )
    )
    is_rows = (
        n.join(is_q, n["_n_lower"].contains(is_q["_a1"]))
        .select(
            "query",
            F.lit("Is").alias("predicate"),
            F.lit("X").alias("variable"),
            F.concat(
                "entity_name", F.lit(" ("), "match_entity_type", F.lit(")")
            ).alias("value"),
            "entity_id",
            name_sim.cast("double").alias("confidence"),
        )
    )

    # ---- entity resolution for 2-arg predicates (rs:744-757) ----
    def resolve(arg_col: str) -> DataFrame:
        """arg → best entity: exact match preferred, then containment;
        ties broken on entity_id (reference scan order is insertion
        order, unspecified across runs — pinned deterministically)."""
        from pyspark.sql import Window

        args = F.broadcast(
            lf.where(F.col("predicate").isin("Related", "Compare"))
            .select("query", "predicate", F.lower(arg_col).alias("_a"))
            .where(F.col("_a").isNotNull())
        )
        cand = n.join(
            args,
            n["_n_lower"].contains(args["_a"]) | args["_a"].contains(n["_n_lower"]),
        ).withColumn(
            "_exact", (F.col("_n_lower") == F.col("_a")).cast("int")
        )
        w = Window.partitionBy("query", "predicate", "_a").orderBy(
            F.desc("_exact"), F.asc("entity_id")
        )
        return (
            cand.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(
                "query",
                "predicate",
                F.col("entity_id").alias(f"{arg_col}_id"),
                F.col("entity_name").alias(f"{arg_col}_name"),
                F.col("match_entity_type").alias(f"{arg_col}_type"),
            )
        )

    r1 = resolve("arg1")
    r2 = resolve("arg2")
    resolved = r1.join(r2, ["query", "predicate"])

    # ---- Related ----
    rel = resolved.where(F.col("predicate") == "Related")
    e = edges.select(
        F.col("subj").alias("_es"), F.col("pred").alias("_ep"),
        F.col("obj").alias("_eo"), F.col("confidence").alias("_ec"),
    )
    direct = rel.join(
        e,
        ((F.col("arg1_id") == F.col("_es")) & (F.col("arg2_id") == F.col("_eo")))
        | ((F.col("arg1_id") == F.col("_eo")) & (F.col("arg2_id") == F.col("_es"))),
        "left",
    )
    rel_rows = direct.select(
        "query",
        F.lit("Related").alias("predicate"),
        F.lit("R").alias("variable"),
        F.when(
            F.col("_ep").isNotNull(),
            F.concat_ws(" ", "arg1_name", "_ep", "arg2_name"),
        )
        .otherwise(
            F.concat(
                F.lit("No direct relationship found between "),
                "arg1_name", F.lit(" and "), "arg2_name",
            )
        )
        .alias("value"),
        F.lit(None).cast("string").alias("entity_id"),
        F.coalesce(F.col("_ec").cast("double"), F.lit(0.3)).alias("confidence"),
    )

    # ---- Compare ----
    cmp_rows = resolved.where(F.col("predicate") == "Compare").select(
        "query",
        F.lit("Compare").alias("predicate"),
        F.lit("comparison").alias("variable"),
        F.concat(
            "arg1_name", F.lit(" is a "), "arg1_type",
            F.lit(" while "), "arg2_name", F.lit(" is a "), "arg2_type",
        ).alias("value"),
        F.lit(None).cast("string").alias("entity_id"),
        F.lit(0.7).alias("confidence"),
    )

    return is_rows.unionByName(rel_rows).unionByName(cmp_rows)


PROCESS_PRE_SCHEMA = (
    "query string, subquery_id string, subquery string, refused boolean, "
    "refusal_reason string, predicate string, arg1 string, arg2 string, "
    "intent string, intent_confidence double"
)

RESULT_SCHEMA = (
    "query string, subquery string, result_type string, confidence double, "
    "content string, sources array<string>"
)


def rograg_process(
    queries: DataFrame,
    nodes: DataFrame,
    edges: DataFrame,
    text_col: str = "query",
    similarity_threshold: float = 0.6,
    max_matches: int = 10,
    refusal_threshold: float = 0.8,
) -> DataFrame:
    """The ROGRAG processor ladder (processor.rs:353-512), batched.

    Per query: validate (validator.rs:295-366) → intent classify with
    refusal (rs:371-404) → hybrid decomposition (rs:413-430) → per
    subquery, LEVEL-1 logic-form retrieval; subqueries whose logic form
    does not parse OR produces zero bindings fall back to LEVEL-2 fuzzy
    entity matching (rs:475-512); fuzzy misses yield the reference's
    Fallback row (confidence 0.1, rs:452-460).

    Returns one row per (query, subquery) result:
    (query, subquery, result_type ∈ {Refusal, LogicForm, FuzzyMatch,
    Fallback}, confidence, content, sources).

    * LogicForm rows: content = generate_answer (first binding's value,
      logic_form.rs:884-911), confidence = mean binding confidence
      (rs:915-922), sources = binding entity ids (rs:925-930).
    * FuzzyMatch rows: content = the bulleted top-3 summary
      (fuzzy_matcher.rs:688-705), confidence = the position- and
      type-weighted mean (rs:642-685).

    The reference's template-based prose rendering (streaming.rs) is
    deliberately NOT ported: it is presentation, not data processing —
    the engine returns the structured results the templates would
    verbalize.

    ``refusal_threshold`` defaults to the reference's 0.8
    (intent_classifier.rs:177) — NB under the reference's own scoring
    formula pattern scores rarely exceed ~0.45, so the default refuses
    nearly every query (quirk preserved); practical deployments pass a
    calibrated threshold. Inappropriate-content refusals fire at ANY
    threshold.

    Plan shape: the per-row ladder (validate/intent/decompose/parse) is
    ONE Arrow pass over the query batch; the graph-touching levels are
    broadcast joins against distributed nodes/edges; the final
    per-subquery roll-ups group a ≤ max_matches-per-subquery table.
    """

    def pre(batches):
        import pandas as pd

        from graphrag_rs_spark.rules.rograg import (
            classify_intent,
            decompose_hybrid,
            parse_logic_form,
            validate_query,
        )

        for pdf in batches:
            rows = []
            for q in pdf[text_col]:
                q = q or ""
                v = validate_query(q)
                if not v.is_valid:
                    reason = (
                        v.issues[0].description if v.issues
                        else "Query validation failed"
                    )
                    rows.append((q, None, None, True, reason,
                                 None, None, None, None, None))
                    continue
                intent = classify_intent(q, refusal_threshold=refusal_threshold)
                if intent.should_refuse:
                    rows.append(
                        (q, None, None, True,
                         intent.refusal_reason
                         or "Query cannot be answered safely",
                         None, None, None, intent.primary_intent,
                         float(intent.confidence))
                    )
                    continue
                d = decompose_hybrid(q)
                for sub in d.subqueries:
                    lf = parse_logic_form(sub.text)
                    rows.append(
                        (q, sub.id, sub.text, False, None,
                         lf.predicate if lf else None,
                         dict(lf.arguments).get("X") if lf else None,
                         dict(lf.arguments).get("Y") if lf else None,
                         intent.primary_intent, float(intent.confidence))
                    )
            yield pd.DataFrame(
                rows,
                columns=["query", "subquery_id", "subquery", "refused",
                         "refusal_reason", "predicate", "arg1", "arg2",
                         "intent", "intent_confidence"],
            )

    pre_df = (
        queries.select(F.col(text_col))
        .mapInPandas(pre, schema=PROCESS_PRE_SCHEMA)
        .localCheckpoint(eager=False)
    )

    refusals = pre_df.where(F.col("refused")).select(
        "query",
        F.lit(None).cast("string").alias("subquery"),
        F.lit("Refusal").alias("result_type"),
        F.lit(0.0).alias("confidence"),
        F.col("refusal_reason").alias("content"),
        F.array().cast("array<string>").alias("sources"),
    ).distinct()

    pending = pre_df.where(~F.col("refused"))

    # ---- level 1: logic-form execution, keyed by distinct subquery text
    parsed = pending.where(F.col("predicate").isNotNull())
    lf_df = parsed.select(
        F.col("subquery").alias("query"), "predicate", "arg1", "arg2"
    ).distinct()
    bindings = execute_logic_forms(lf_df, nodes, edges)
    # generate_answer takes the FIRST binding (logic_form.rs:884-911) —
    # first in the reference's entity-scan order, which is unspecified.
    # Pin a deterministic stand-in: highest confidence, ties on value.
    lf_results = bindings.groupBy(F.col("query").alias("subquery")).agg(
        F.max_by("value", F.struct("confidence", "value")).alias("content"),
        F.avg("confidence").alias("confidence"),
        F.array_sort(
            F.array_distinct(
                F.collect_list(F.coalesce("entity_id", F.lit("")))
            )
        ).alias("_sources_raw"),
    ).select(
        "subquery", "content", "confidence",
        F.array_remove("_sources_raw", "").alias("sources"),
    )

    logic_rows = (
        parsed.join(lf_results, "subquery")
        .select(
            "query", "subquery",
            F.lit("LogicForm").alias("result_type"),
            F.col("confidence").cast("double"),
            "content", "sources",
        )
    )

    # ---- level 2: fuzzy fallback for unparsed or zero-binding subqueries
    fallback_pending = pending.join(
        lf_results.select("subquery"), "subquery", "left_anti"
    )
    fuzzy = fuzzy_match_entities(
        fallback_pending.select(F.col("subquery").alias("query")).distinct(),
        nodes,
        similarity_threshold=similarity_threshold,
        max_matches=max_matches,
    )

    def summarize(key, pdf):
        import pandas as pd

        from graphrag_rs_spark.rules.rograg import fuzzy_overall_confidence

        pdf = pdf.sort_values(
            ["similarity", "entity_id", "match_type"],
            ascending=[False, True, True],
        )
        sims = list(zip(pdf["similarity"], pdf["match_type"]))
        conf = fuzzy_overall_confidence(sims)
        # generate_response_content (fuzzy_matcher.rs:688-705)
        tops = pdf.head(3)
        lines = [
            f"• {c} ({t}) (similarity: {s:.2f})"
            for c, t, s in zip(
                tops["entity_name"], tops["match_entity_type"],
                tops["similarity"],
            )
        ]
        content = "\n".join(lines)
        if len(pdf) > 3:
            content += f"\n... and {len(pdf) - 3} more results"
        sources = sorted(set(pdf["entity_id"]))
        return pd.DataFrame(
            {"subquery": [key[0]], "confidence": [conf],
             "content": [content], "sources": [sources]}
        )

    fuzzy_agg = fuzzy.groupBy("query").applyInPandas(
        summarize,
        schema=(
            "subquery string, confidence double, content string, "
            "sources array<string>"
        ),
    )
    fuzzy_rows = (
        fallback_pending.join(fuzzy_agg, "subquery")
        .select(
            "query", "subquery",
            F.lit("FuzzyMatch").alias("result_type"),
            "confidence", "content", "sources",
        )
    )

    # ---- fallback rows: neither level produced anything (rs:452-460)
    no_result = (
        fallback_pending
        .join(fuzzy_agg.select("subquery"), "subquery", "left_anti")
        .select(
            "query", "subquery",
            F.lit("Fallback").alias("result_type"),
            F.lit(0.1).alias("confidence"),
            F.lit("Unable to process this part of the query").alias("content"),
            F.array().cast("array<string>").alias("sources"),
        )
    )

    return (
        refusals.unionByName(logic_rows)
        .unionByName(fuzzy_rows)
        .unionByName(no_result)
    )
