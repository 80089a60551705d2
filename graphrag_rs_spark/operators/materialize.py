"""Stage E — graph materialization: re-point edges, build nodes/edges tables.

* Edge re-pointing — every raw triple's subj/obj is replaced by its cluster's
  canonical id (the consumer side of the linker's links map,
  graphrag-rs string_similarity_linker.rs:66-71). Hub entities make the
  re-point join the pipeline's skew hot spot: the linkmap side is small
  relative to edges, so we BROADCAST it; when a linkmap is too large to
  broadcast, ``salt_buckets`` activates the salted shuffle join
  (functions.with_salt / salted_join_small_side).
* Self-loops created by merging near-duplicate endpoints are dropped.
* Edge dedupe — key (subj, obj, pred), keep max confidence, union contexts
  (gleaning_extractor.rs:418-435).
* Referential integrity — both endpoints must exist in nodes
  (core/mod.rs:291-306: add_relationship requires both endpoints).
* Node stats — degree (graph/analytics.rs:69-89) and connected-component
  communities with sizes (analytics.rs:97-176, leiden.rs:106-120).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.functions import tune_object_agg
from graphrag_rs_spark.operators.graph import communities, degrees


def repoint_edges(
    edges_raw: DataFrame,
    clusters: DataFrame,
    broadcast_linkmap: bool = True,
    relationship_confidence: float = 0.5,
    int_coded_agg: bool = True,
) -> DataFrame:
    """Map subj/obj to canonical cluster ids and dedupe.

    Accepts EITHER shape of raw triples:

    * occurrence-level rows (subj, pred, obj, confidence, context_chunk)
      from ``edges_raw_table``, or
    * per-partition pre-combined rows (subj, pred, obj, contexts,
      n_occurrences) from ``edges_partial_table`` — ~30× fewer rows reach
      the joins and the final aggregation merges partial context sets
      (associative, bit-identical result).

    Returns edges(subj, pred, obj, confidence, context array<string>).

    ``int_coded_agg`` (occurrence path only): the dedupe exchange is the
    build's largest shuffle — tens of millions of occurrence rows keyed
    by two ~22-byte canonical-id strings. The same broadcast join that
    re-points an endpoint also attaches a per-cluster LONG code (built
    once from the distinct cluster ids, materialized so the encode and
    decode sides read one snapshot), the aggregation groups on the code
    pair (~45% fewer shuffle bytes, long comparisons instead of string),
    and a broadcast decode restores the canonical-id strings afterwards —
    the output is IDENTICAL row-for-row. Endpoints absent from the
    linkmap (impossible in the pipeline, where every entity maps to a
    cluster — singletons to themselves — but legal for foreign inputs)
    keep their raw string in the group key, so correctness does not
    depend on coverage.
    """
    combined = "contexts" in edges_raw.columns

    if combined:
        repointed, _ = repointed_occurrences(
            edges_raw, clusters, broadcast_linkmap
        )
        # occurrence rows all carry the constant config confidence
        # (edges_raw_table semantics, config/mod.rs:887-889), so max == lit
        return (
            repointed.groupBy("subj", "pred", "obj")
            .agg(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("contexts")))
                ).alias("context"),
            )
            .select(
                "subj",
                "pred",
                "obj",
                F.lit(relationship_confidence).cast("float").alias("confidence"),
                "context",
            )
        )

    if not int_coded_agg:
        repointed, _ = repointed_occurrences(
            edges_raw, clusters, broadcast_linkmap
        )
        # dedupe on (subj, obj, pred): max confidence, contexts unioned
        # (groupBy does map-side partial aggregation, so hub-entity skew
        # is absorbed by the combiner before the shuffle)
        return repointed.groupBy("subj", "pred", "obj").agg(
            F.max("confidence").alias("confidence"),
            F.array_sort(F.collect_set("context_chunk")).alias("context"),
        )

    # ---- int-coded aggregation path ----
    codes = (
        clusters.select("cluster_id")
        .distinct()
        .withColumn("_code", F.monotonically_increasing_id())
        # encode and decode MUST see the same code assignment;
        # monotonically_increasing_id is partition-dependent, so pin one
        # materialized snapshot for both scans
        .localCheckpoint(eager=False)
    )
    # Identity rows for cluster_ids that are NOT themselves mapped
    # entity_ids: a raw endpoint string equal to such a cluster_id must
    # land in the SAME group as rows coded to that cluster (the legacy
    # path groups on decoded strings, where they collide). Pipeline-
    # produced clusters always contain their representative, so this
    # anti-join is empty there; it only fires on foreign inputs.
    identity = (
        codes.select(
            F.col("cluster_id").alias("entity_id"), "cluster_id", "_code"
        )
        .join(clusters.select("entity_id"), "entity_id", "left_anti")
    )
    linkmap = (
        clusters.select("entity_id", "cluster_id")
        .join(codes, "cluster_id")
        .unionByName(identity)
    )
    if broadcast_linkmap:
        linkmap = F.broadcast(linkmap)

    coded = (
        edges_raw.join(
            linkmap.select(
                F.col("entity_id").alias("subj"),
                F.col("_code").alias("_scode"),
            ),
            "subj",
            "left",
        )
        .join(
            linkmap.select(
                F.col("entity_id").alias("obj"),
                F.col("_code").alias("_ocode"),
            ),
            "obj",
            "left",
        )
        .select(
            "_scode",
            # raw string rides in the key ONLY when no code exists
            F.when(F.col("_scode").isNull(), F.col("subj")).alias("_sraw"),
            "pred",
            "_ocode",
            F.when(F.col("_ocode").isNull(), F.col("obj")).alias("_oraw"),
            "confidence",
            "context_chunk",
        )
        # merged endpoints → self-loop → drop (null-safe on both parts)
        .where(
            ~(
                F.col("_scode").eqNullSafe(F.col("_ocode"))
                & F.col("_sraw").eqNullSafe(F.col("_oraw"))
            )
        )
    )
    agg = coded.groupBy("_scode", "_sraw", "pred", "_ocode", "_oraw").agg(
        F.max("confidence").alias("confidence"),
        F.array_sort(F.collect_set("context_chunk")).alias("context"),
    )
    sdec = F.broadcast(
        codes.select(
            F.col("_code").alias("_scode"), F.col("cluster_id").alias("_sdec")
        )
    )
    odec = F.broadcast(
        codes.select(
            F.col("_code").alias("_ocode"), F.col("cluster_id").alias("_odec")
        )
    )
    return (
        agg.join(sdec, "_scode", "left")
        .join(odec, "_ocode", "left")
        .select(
            F.coalesce("_sdec", "_sraw").alias("subj"),
            "pred",
            F.coalesce("_odec", "_oraw").alias("obj"),
            "confidence",
            "context",
        )
        # The pre-agg coded filter is conservative: it cannot see a
        # MAPPED endpoint whose cluster_id string equals the other
        # side's UNMAPPED raw string (code vs raw compare), and it keeps
        # rows with NULL endpoints that the legacy path's `subj != obj`
        # null semantics drop. Finish both on the decoded (post-agg,
        # small) rows so the two paths are row-identical on any input.
        .where(F.col("subj") != F.col("obj"))
    )


def repointed_occurrences(
    edges_raw: DataFrame,
    clusters: DataFrame,
    broadcast_linkmap: bool = True,
) -> tuple[DataFrame, bool]:
    """Occurrence-level triples with endpoints re-pointed to cluster ids,
    self-loops dropped — the shared input of the context-carrying edge
    aggregation AND the slim (subj, pred, obj) key table."""
    combined = "contexts" in edges_raw.columns
    linkmap = clusters.select("entity_id", "cluster_id")
    if broadcast_linkmap:
        linkmap = F.broadcast(linkmap)

    carry = ["contexts", "n_occurrences"] if combined else [
        "confidence", "context_chunk"
    ]
    repointed = (
        edges_raw.join(
            linkmap.select(
                F.col("entity_id").alias("subj"), F.col("cluster_id").alias("subj_c")
            ),
            "subj",
            "left",
        )
        .join(
            linkmap.select(
                F.col("entity_id").alias("obj"), F.col("cluster_id").alias("obj_c")
            ),
            "obj",
            "left",
        )
        .select(
            F.coalesce("subj_c", "subj").alias("subj"),
            F.col("pred"),
            F.coalesce("obj_c", "obj").alias("obj"),
            *carry,
        )
        .where(F.col("subj") != F.col("obj"))  # merged endpoints → self-loop → drop
    )
    return repointed, combined


def nodes_table(clusters: DataFrame, entities_raw: DataFrame) -> DataFrame:
    """One row per canonical entity: name/type/confidence + roll-ups."""
    enriched = clusters.join(
        entities_raw.select("entity_id", "mention_count", "aliases"), "entity_id"
    )
    return enriched.groupBy("cluster_id").agg(
        F.first("canonical_name").alias("name"),
        F.first("entity_type").alias("entity_type"),
        F.max("confidence").alias("confidence"),
        F.sum("mention_count").alias("mention_count"),
        F.count(F.lit(1)).alias("member_count"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("aliases")))).alias("aliases"),
    )


def materialize_graph(
    edges_raw: DataFrame,
    clusters: DataFrame,
    entities_raw: DataFrame,
    config: PipelineConfig | None = None,
    cache_intermediate: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (nodes, edges, node_stats).

    ``cache_intermediate`` caches the SLIM tables that multiple consumers
    scan (nodes; the distinct (subj, pred, obj) key set feeding degrees and
    communities). The context-carrying edge table itself is deliberately
    NEVER memory-cached: Spark's in-memory columnar encoder is pathological
    on array columns (measured 255 s to cache 4.2M context-carrying rows
    that took 31 s to COMPUTE), so persisting it costs ~8× the recompute
    it saves. Stats consumers read the flat key table instead; callers who
    rescan `edges` repeatedly should checkpoint it to parquet
    (plans/checkpoint.py), which encodes arrays natively."""
    config = config or PipelineConfig()
    tune_object_agg(edges_raw.sparkSession)
    nodes = nodes_table(clusters, entities_raw)
    if cache_intermediate:
        # nodes feeds the integrity-filter broadcast AND the output
        nodes = nodes.cache()
    edges = repoint_edges(
        edges_raw, clusters,
        relationship_confidence=config.relationship_confidence,
    )
    # slim dedupe for stats: same key set as `edges`, no context arrays —
    # cheap to aggregate (no array buffers), flat-column cacheable
    repointed, _ = repointed_occurrences(edges_raw, clusters)
    edge_keys = repointed.select("subj", "pred", "obj").distinct()

    # referential integrity (core/mod.rs:291-306): drop edges with unknown
    # endpoints — left-semi joins prune without widening rows
    node_ids = nodes.select(F.col("cluster_id").alias("_nid"))

    def integrity(df: DataFrame) -> DataFrame:
        df = df.join(
            F.broadcast(node_ids), df["subj"] == F.col("_nid"), "left_semi"
        )
        return df.join(
            F.broadcast(node_ids), df["obj"] == F.col("_nid"), "left_semi"
        )

    edges = integrity(edges)
    edge_keys = integrity(edge_keys)
    if cache_intermediate:
        edge_keys = edge_keys.cache()

    deg = degrees(edge_keys, src="subj", dst="obj")
    comm = communities(edge_keys, src="subj", dst="obj")

    node_stats = (
        nodes.select("cluster_id")
        .join(deg, nodes["cluster_id"] == deg["id"], "left")
        .drop("id")
        .join(comm, nodes["cluster_id"] == comm["id"], "left")
        .drop("id")
        .select(
            "cluster_id",
            F.coalesce("degree", F.lit(0)).alias("degree"),
            F.coalesce("community_id", F.col("cluster_id")).alias("community_id"),
            F.coalesce("community_size", F.lit(1)).alias("community_size"),
        )
    )
    return nodes, edges, node_stats


def graph_statistics(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-type entity counts + global counts (graph/mod.rs:316-373)."""
    by_type = nodes.groupBy("entity_type").agg(F.count(F.lit(1)).alias("n"))
    totals = nodes.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("__total_nodes").alias("entity_type"), "n"
    )
    edge_total = edges.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("__total_edges").alias("entity_type"), "n"
    )
    return by_type.unionByName(totals).unionByName(edge_total)
