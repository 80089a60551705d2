"""LazyGraphRAG query refinement (lightrag/query_refinement.rs).

Zero-LLM iterative query expansion over the concept graph plus chunk
retrieval through the entity↔chunk bidirectional index — re-expressed as
a BATCH operator: a DataFrame of queries expands simultaneously, each
iteration being a handful of joins against the distributed concept /
relation / mention tables.

Reference semantics preserved (rs:104-325), including quirks:

* ``min_cooccurrence`` sits in the config but is never consulted by
  ``refine_query`` — same here (accepted, ignored, documented);
* concept normalization lowercases then FILTERS to alphanumeric+
  underscore before the space→underscore replace, so the replace is a
  no-op and "Machine Learning" → "machinelearning" (rs:307-314);
* relevance feedback denormalizes entity ids by dropping the
  all-uppercase type prefix and compares the result against the RAW
  concept text (rs:292-302) — it therefore only fires for single-word
  lowercase concepts; faithful, documented;
* the reference iterates a HashSet when expanding and caps
  ``max_total_concepts`` mid-iteration in that unspecified order — the
  deterministic stand-in ranks candidates by (score desc, concept asc)
  and keeps the top ``max_total_concepts − |current|`` per query.

Inputs are the tables the build pipeline already produces:
``concepts``  (concept, frequency)            — chunk_concepts roll-up
``relations`` (source, target, confidence)    — concept_cooccurrence
``mentions``  (concept_norm, chunk_id)        — the bidirectional index
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_concept_col(col):
    """rs:307-314 normalize_concept as a JVM expression (quirk preserved:
    spaces are stripped by the filter, not turned into underscores)."""
    return F.regexp_replace(F.lower(col), r"[^0-9a-z_]", "")


def denormalize_entity_id_col(col):
    """rs:317-325: drop leading all-uppercase '_'-separated parts."""
    parts = F.split(col, "_")
    kept = F.filter(
        parts,
        # keep parts from the first NON-all-uppercase part onward: a part
        # is dropped iff it and every part before it is all-uppercase —
        # approximated per rs semantics by skip-while on upper(part)==part
        lambda p, i: ~F.forall(
            F.slice(parts, 1, i + 1), lambda q: F.upper(q) == q
        ),
    )
    return F.array_join(kept, "_")


def refine_queries(
    queries: DataFrame,
    concepts: DataFrame,
    relations: DataFrame,
    mentions: DataFrame,
    text_col: str = "query",
    max_iterations: int = 3,
    concepts_per_iteration: int = 5,
    min_cooccurrence: int = 2,  # accepted + unused, like the reference
    max_total_concepts: int = 20,
    use_relevance_feedback: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Batch refine_query (rs:104-221).

    Returns ``(expanded, chunks)``:

    * ``expanded`` — (query, concept, score, is_initial, iteration):
      initial concepts at score 1.0 (rs:130-133) plus every expansion
      with its connectivity score (rs:223-256: (ln(freq)+1) ·
      (1 + 0.5·connections-to-current));
    * ``chunks`` — (query, chunk_id): union of chunks retrieved for each
      iteration's NEW concepts through the mention index (rs:258-276).

    Queries whose text yields no concepts simply contribute no rows
    (rs:113-122's empty result).

    Scale shape: the query batch is broadcast; concept/relation/mention
    tables stay partitioned. Each iteration = one relation join + one
    window top-k + one scoring join pair + one mention join, state EAGERLY
    localCheckpoint-ed per iteration: each iteration references the prior
    state several times, so without truncation the logical plan grows
    ~5^iterations and analysis OOMs the driver (measured); the lazy
    checkpoint variant mis-resolves attributes on empty unions, eager is
    both correct and bounded. Checkpointed state is query-batch-sized.
    """
    del min_cooccurrence  # rs config field is never read by refine_query

    q = queries.select(F.col(text_col).alias("query")).distinct()

    # ---- step 1: initial concepts (ConceptExtractor on the query text)
    def extract(batches):
        import pandas as pd

        from graphrag_rs_spark.rules.concepts import extract_concepts

        for pdf in batches:
            rows = []
            for query in pdf["query"]:
                for c in extract_concepts(query or ""):
                    rows.append((query, c))
            yield pd.DataFrame(rows, columns=["query", "concept"])

    current = (
        q.mapInPandas(extract, schema="query string, concept string")
        .distinct()
        .select(
            "query",
            "concept",
            F.lit(1.0).alias("score"),
            F.lit(True).alias("is_initial"),
            F.lit(0).alias("iteration"),
        )
        .localCheckpoint(eager=True)
    )

    rel = relations.select(
        F.col("source"), F.col("target"), F.col("confidence").cast("double")
    )
    freq = concepts.select(
        F.col("concept").alias("target"),
        F.col("frequency").cast("double").alias("_freq"),
    )
    ment = mentions.select(
        F.col(mentions.columns[0]).alias("_norm"),
        F.col(mentions.columns[1]).alias("chunk_id"),
    )

    all_chunks = None
    from pyspark.sql import Window

    for iteration in range(1, max_iterations + 1):
        cur = F.broadcast(current.select("query", "concept", "score"))

        # related concepts: top-k outgoing edges by confidence (rs:466-486)
        w_rel = Window.partitionBy("query", "concept").orderBy(
            F.desc("confidence"), F.asc("target")
        )
        related = (
            cur.join(rel, cur["concept"] == rel["source"])
            .withColumn("_rk", F.row_number().over(w_rel))
            .where(F.col("_rk") <= concepts_per_iteration)
            .select("query", "target")
            .distinct()
        )
        candidates = related.join(
            current.select("query", F.col("concept").alias("target")),
            ["query", "target"],
            "left_anti",
        )

        # connectivity score (rs:223-256); rs checks relations in BOTH
        # directions, so count through a symmetric edge union. NB both
        # candidates and sym descend from `relations` — rename columns on
        # each side so Spark's ambiguous-self-join check can't trip.
        sym = (
            rel.select(
                F.col("source").alias("_ssrc"), F.col("target").alias("_sdst")
            )
            .unionByName(
                rel.select(
                    F.col("target").alias("_ssrc"),
                    F.col("source").alias("_sdst"),
                )
            )
            .distinct()
        )
        cand_t = candidates.select("query", F.col("target").alias("_cand"))
        conn_counts = (
            cand_t.join(sym, F.col("_cand") == F.col("_ssrc"))
            .join(
                current.select(
                    F.col("query").alias("_q2"), F.col("concept").alias("_curc")
                ),
                (F.col("query") == F.col("_q2"))
                & (F.col("_sdst") == F.col("_curc")),
            )
            .groupBy("query", "_cand")
            .agg(F.countDistinct("_curc").alias("_conn"))
            .select("query", F.col("_cand").alias("target"), "_conn")
        )
        scored = (
            candidates.join(freq, "target")  # missing freq → score 0 → drop
            .join(conn_counts, ["query", "target"], "left")
            .select(
                "query",
                F.col("target").alias("concept"),
                (
                    (F.log("_freq") + 1.0)
                    * (1.0 + F.coalesce(F.col("_conn"), F.lit(0)) * 0.5)
                ).alias("score"),
            )
            .where(F.col("score") > 0)
        )

        # deterministic max_total_concepts cap (see module docstring)
        cur_counts = current.groupBy("query").agg(F.count("*").alias("_n"))
        w_cap = Window.partitionBy("query").orderBy(
            F.desc("score"), F.asc("concept")
        )
        new_concepts = (
            scored.join(cur_counts, "query")
            .withColumn("_rk", F.row_number().over(w_cap))
            .where(F.col("_rk") <= F.greatest(
                F.lit(max_total_concepts) - F.col("_n"), F.lit(0)
            ))
            .select(
                "query",
                "concept",
                "score",
                F.lit(False).alias("is_initial"),
                F.lit(iteration).alias("iteration"),
            )
            .localCheckpoint(eager=True)
        )

        # chunks for the NEW concepts (rs:176-183, 258-276)
        iter_chunks = (
            new_concepts.select(
                "query", normalize_concept_col(F.col("concept")).alias("_norm")
            )
            .join(ment, "_norm")
            .select("query", "chunk_id")
            .distinct()
        )
        all_chunks = (
            iter_chunks
            if all_chunks is None
            else all_chunks.unionByName(iter_chunks).distinct()
        )

        # relevance feedback (rs:278-304): boost scores of concepts whose
        # text equals a denormalized entity id in the retrieved chunks
        if use_relevance_feedback and iteration < max_iterations:
            chunk_ents = (
                all_chunks.join(ment, "chunk_id")
                .select(
                    "query",
                    denormalize_entity_id_col(F.col("_norm")).alias("_dconcept"),
                )
                .groupBy("query", "_dconcept")
                .agg(F.count("*").alias("_freq"))
            )
            boosted = current.unionByName(new_concepts).alias("c").join(
                chunk_ents.alias("f"),
                (F.col("c.query") == F.col("f.query"))
                & (F.col("c.concept") == F.col("f._dconcept")),
                "left",
            ).select(
                F.col("c.query").alias("query"),
                F.col("c.concept").alias("concept"),
                F.when(
                    F.col("f._freq").isNotNull(),
                    F.col("c.score") * (1.0 + F.log(F.col("f._freq"))),
                )
                .otherwise(F.col("c.score"))
                .alias("score"),
                F.col("c.is_initial").alias("is_initial"),
                F.col("c.iteration").alias("iteration"),
            )
            current = boosted.localCheckpoint(eager=True)
        else:
            # both sides are checkpoint scans already — the union is a
            # flat plan, and checkpointing a union-of-checkpoints trips
            # Spark's DeduplicateRelations ("key not found" on resolve)
            current = current.unionByName(new_concepts)

    chunks = (
        all_chunks
        if all_chunks is not None
        else q.select("query", F.lit(None).cast("string").alias("chunk_id")).where(
            F.lit(False)
        )
    )
    return current, chunks


def iterative_deepening_search(
    queries: DataFrame,
    concepts: DataFrame,
    relations: DataFrame,
    mentions: DataFrame,
    text_col: str = "query",
    max_depth: int = 3,
    min_chunks: int = 5,
    max_chunks: int = 50,
    concepts_per_depth: int = 5,
    use_adaptive_depth: bool = True,
    adaptive_quality_threshold: float = 0.7,
) -> tuple[DataFrame, DataFrame]:
    """Iterative deepening search (lightrag/iterative_deepening.rs:112-302),
    batched over a query DataFrame.

    Per depth 0..max_depth−1, for every still-active query: retrieve the
    chunks of all current concepts through the mention index; then stop
    the query if (in rs order) |visited| ≥ max_chunks
    (``MaxChunksReached``), or |visited| ≥ min_chunks AND adaptive AND
    depth > 0 AND chunks-per-concept ≥ the quality threshold
    (``QualityThresholdMet``); otherwise expand: each current concept
    nominates its top-k related concepts, a nominee's connectivity score
    (ln(freq)+1)·(1+0.5·connections) is SUMMED once per nominating
    concept (rs:238-244 quirk — the same score accumulates per
    nominator), global top ``concepts_per_depth`` join the concept set;
    no nominees → ``NoMoreConcepts``. Queries that never stop finish as
    ``MaxDepthReached`` (rs default).

    Reference quirk preserved: ``search`` runs the full query refinement
    but uses ONLY its initial concepts (rs:122-134) — i.e. initial
    concepts are exactly ``extract_concepts(query)``.

    Documented DIVERGENCE: the reference's ``should_stop_early``
    (rs:289-302) reads ``results.total_chunks`` / ``total_concepts_
    explored``, which are only assigned AFTER the loop (rs:183-184) — so
    its quality stop computes 0/0 and can never fire. We evaluate the
    quality ratio on the LIVE per-query counts (the evident intent);
    keep ``use_adaptive_depth=False`` for the reference's reachable
    behavior.

    Returns ``(chunks, summary)``:
    * ``chunks``  — (query, chunk_id, depth_found)
    * ``summary`` — (query, depth_reached, total_chunks,
      total_concepts_explored, stop_reason)
    """
    from pyspark.sql import Window

    q = queries.select(F.col(text_col).alias("query")).distinct()

    def extract(batches):
        import pandas as pd

        from graphrag_rs_spark.rules.concepts import extract_concepts

        for pdf in batches:
            rows = []
            for query in pdf["query"]:
                for c in extract_concepts(query or ""):
                    rows.append((query, c))
            yield pd.DataFrame(rows, columns=["query", "concept"])

    cur = (
        q.mapInPandas(extract, schema="query string, concept string")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # queries with no concepts never enter the loop (rs:129-131)
    state = cur.select("query").distinct().select(
        "query",
        F.lit(True).alias("active"),
        F.lit(0).alias("depth_reached"),
        F.lit(None).cast("string").alias("stop_reason"),
    )

    rel = relations.select("source", "target", F.col("confidence").cast("double"))
    # renamed columns: sym is rel-derived and later joins other
    # rel-derived frames (see refine_queries note on ambiguous self-joins)
    sym = (
        rel.select(
            F.col("source").alias("_ssrc"), F.col("target").alias("_sdst")
        )
        .unionByName(
            rel.select(
                F.col("target").alias("_ssrc"), F.col("source").alias("_sdst")
            )
        )
        .distinct()
    )
    freq = concepts.select(
        F.col("concept").alias("target"),
        F.col("frequency").cast("double").alias("_freq"),
    )
    ment = mentions.select(
        F.col(mentions.columns[0]).alias("_norm"),
        F.col(mentions.columns[1]).alias("chunk_id"),
    )

    visited = None  # (query, chunk_id, depth_found)

    for depth in range(max_depth):
        active_q = state.where(F.col("active")).select("query")
        active_cur = cur.join(active_q, "query")

        # chunks for ALL current concepts of active queries (rs:206-220)
        hits = (
            active_cur.select(
                "query", normalize_concept_col(F.col("concept")).alias("_norm")
            )
            .join(ment, "_norm")
            .select("query", "chunk_id")
            .distinct()
            .withColumn("depth_found", F.lit(depth))
        )
        new_hits = (
            hits
            if visited is None
            else hits.join(
                visited.select("query", "chunk_id"), ["query", "chunk_id"],
                "left_anti",
            )
        )
        visited = (
            new_hits
            if visited is None
            else visited.unionByName(new_hits)
        ).localCheckpoint(eager=True)

        # per-query stop checks, in rs:149-163 order
        counts = (
            visited.groupBy("query").agg(F.count("*").alias("_vis"))
        )
        ccounts = active_cur.groupBy("query").agg(F.count("*").alias("_ncur"))
        quality_ok = (
            (F.col("_vis") >= min_chunks)
            & F.lit(use_adaptive_depth)
            & F.lit(depth > 0)
            & (
                F.col("_vis").cast("double")
                / F.greatest(F.col("_ncur"), F.lit(1)).cast("double")
                >= adaptive_quality_threshold
            )
        )
        stops = (
            active_q.join(counts, "query", "left")
            .join(ccounts, "query", "left")
            .select(
                "query",
                F.when(
                    F.coalesce(F.col("_vis"), F.lit(0)) >= max_chunks,
                    F.lit("MaxChunksReached"),
                )
                .when(quality_ok, F.lit("QualityThresholdMet"))
                .alias("_stop"),
            )
        )

        # expansion for queries that do not stop (rs:166-179)
        going = stops.where(F.col("_stop").isNull()).select("query")
        going_cur = cur.join(F.broadcast(going), "query")
        w_rel = Window.partitionBy("query", "concept").orderBy(
            F.desc("confidence"), F.asc("target")
        )
        nominees = (
            going_cur.join(rel, going_cur["concept"] == rel["source"])
            .withColumn("_rk", F.row_number().over(w_rel))
            .where(F.col("_rk") <= concepts_per_depth)
            .select("query", going_cur["concept"].alias("_nominator"), "target")
            .join(
                cur.select("query", F.col("concept").alias("target")),
                ["query", "target"],
                "left_anti",
            )
        )
        nom_t = (
            nominees.select("query", F.col("target").alias("_cand")).distinct()
        )
        conn_counts = (
            nom_t.join(sym, F.col("_cand") == F.col("_ssrc"))
            .join(
                cur.select(
                    F.col("query").alias("_q2"), F.col("concept").alias("_curc")
                ),
                (F.col("query") == F.col("_q2"))
                & (F.col("_sdst") == F.col("_curc")),
            )
            .groupBy("query", "_cand")
            .agg(F.countDistinct("_curc").alias("_conn"))
            .select("query", F.col("_cand").alias("target"), "_conn")
        )
        base_score = (
            nominees.select("query", "target").distinct()
            .join(freq, "target")
            .join(conn_counts, ["query", "target"], "left")
            .select(
                "query",
                "target",
                (
                    (F.log("_freq") + 1.0)
                    * (1.0 + F.coalesce(F.col("_conn"), F.lit(0)) * 0.5)
                ).alias("_score1"),
            )
        )
        # rs:238-244: the score accumulates once per NOMINATING concept
        nom_counts = nominees.groupBy("query", "target").agg(
            F.count("*").alias("_nnom")
        )
        summed = base_score.join(nom_counts, ["query", "target"]).select(
            "query",
            "target",
            (F.col("_score1") * F.col("_nnom")).alias("_score"),
        )
        w_top = Window.partitionBy("query").orderBy(
            F.desc("_score"), F.asc("target")
        )
        expanded = (
            summed.withColumn("_rk", F.row_number().over(w_top))
            .where(F.col("_rk") <= concepts_per_depth)
            .select("query", F.col("target").alias("concept"))
        )

        had_expansion = expanded.groupBy("query").agg(
            F.count("*").alias("_nexp")
        )

        # fold stop decisions into state
        state = (
            state.alias("s")
            .join(stops.alias("t"), "query", "left")
            .join(had_expansion.alias("e"), "query", "left")
            .select(
                "query",
                F.when(~F.col("s.active"), F.lit(False))
                .when(F.col("t._stop").isNotNull(), F.lit(False))
                .when(F.col("e._nexp").isNull(), F.lit(False))
                .otherwise(F.lit(True))
                .alias("active"),
                F.when(~F.col("s.active"), F.col("s.depth_reached"))
                .when(F.col("t._stop").isNotNull(), F.lit(depth))
                .when(F.col("e._nexp").isNull(), F.lit(depth))
                .otherwise(F.lit(depth + 1))
                .alias("depth_reached"),
                F.when(~F.col("s.active"), F.col("s.stop_reason"))
                .when(F.col("t._stop").isNotNull(), F.col("t._stop"))
                .when(F.col("e._nexp").isNull(), F.lit("NoMoreConcepts"))
                .otherwise(F.lit(None).cast("string"))
                .alias("stop_reason"),
            )
            .localCheckpoint(eager=True)
        )
        cur = cur.unionByName(expanded).distinct().localCheckpoint(eager=True)

    if visited is None:
        # max_depth=0: the loop never ran — an empty frame with the real
        # column types (query from q, chunk_id from the caller's mention
        # index) keeps the result/summary contract instead of crashing
        visited = (
            q.limit(0)
            .crossJoin(ment.limit(0).select("chunk_id"))
            .withColumn("depth_found", F.lit(0))
        )

    summary = (
        state.join(
            visited.groupBy("query").agg(F.count("*").alias("total_chunks")),
            "query",
            "left",
        )
        .join(
            cur.groupBy("query").agg(
                F.count("*").alias("total_concepts_explored")
            ),
            "query",
            "left",
        )
        .select(
            "query",
            "depth_reached",
            F.coalesce("total_chunks", F.lit(0)).alias("total_chunks"),
            F.coalesce("total_concepts_explored", F.lit(0)).alias(
                "total_concepts_explored"
            ),
            F.coalesce("stop_reason", F.lit("MaxDepthReached")).alias(
                "stop_reason"
            ),
        )
    )
    return visited, summary
