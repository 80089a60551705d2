"""Per-stage scaling diagnosis: exact build_graph stage walls at one
pinned core count, with canonicalize's tail inlined (no duplicate
pairs+scoring+cc recompute), so comparing two runs at different core
counts shows which stage fails to scale.

    N_CONVS=100000 CPUS=16 taskset -c 0-15 python scripts/diag_scaling_stages.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(os.environ.get("N_CONVS", "100000"))
CPUS = int(os.environ.get("CPUS", "16"))

T0 = time.perf_counter()


def mark(label, t0):
    t1 = time.perf_counter()
    print(f"[{CPUS}c] {label}: {t1 - t0:.1f}s  (total {t1 - T0:.0f}s)",
          flush=True)
    return time.perf_counter()


def main():
    global T0
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("diag-scaling-stages")
        .config("spark.local.dir", "/dev/shm/spark-graft-local")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.default.parallelism", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.fixtures import ScaledVocab, transcripts_df
    from graphrag_rs_spark.functions import tune_object_agg
    from graphrag_rs_spark.operators.assembly import assemble_documents
    from graphrag_rs_spark.operators.canonicalize import (
        CLUSTER_ASSIGN_SCHEMA,
        _greedy_replay_cogroup,
        candidate_pairs,
        score_pairs,
    )
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import (
        edges_raw_table,
        entities_raw_table,
        extract_chunks,
    )
    from graphrag_rs_spark.operators.graph import connected_components
    from graphrag_rs_spark.operators.materialize import materialize_graph

    tune_object_agg(spark)
    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)

    # ---- untimed warm-up (same as bench.py) ----
    warm_vocab = ScaledVocab(n_persons=100, n_orgs=40)
    warm = transcripts_df(spark, 200, seed=7, distributed=True,
                          partitions=CPUS, vocab=warm_vocab)
    from graphrag_rs_spark.plans.pipeline import build_graph
    wt = build_graph(spark, warm, cfg)
    wt["edges"].count()
    wt["nodes"].count()
    spark.catalog.clearCache()

    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4, vocab=vocab
    ).cache()
    transcripts.count()
    T0 = time.perf_counter()
    t0 = T0
    t0 = mark("(input materialized; timed window starts)", t0)

    documents = assemble_documents(transcripts, separator=cfg.turn_separator)
    chunks = chunk_documents(documents, cfg).repartition(CPUS * 4)
    extraction = extract_chunks(chunks, cfg).cache()
    entities_raw = entities_raw_table(extraction).cache()
    n = entities_raw.count()
    t0 = mark(f"A entities_raw populate ({n}) [assembly+chunk+extract+rollup]", t0)

    pairs = candidate_pairs(entities_raw, cfg)
    matches = score_pairs(pairs, cfg).localCheckpoint(eager=True)
    t0 = mark(f"B matches checkpoint ({matches.count()} pairs)", t0)

    cc = connected_components(matches, src="id1", dst="id2").localCheckpoint(
        eager=True
    )
    t0 = mark(f"C cc checkpoint ({cc.count()} rows)", t0)

    # ---- canonicalize tail, inlined from canonicalize_entities ----
    n_buckets = max(16, cfg.shuffle_partitions * 4)
    bucket = F.pmod(F.xxhash64("component"), F.lit(n_buckets))
    members = entities_raw.join(cc, entities_raw["entity_id"] == cc["id"]).select(
        "entity_id",
        "confidence",
        F.col("order_key.conv_id").alias("conv_id"),
        F.col("order_key.chunk_idx").alias("chunk_idx"),
        F.col("order_key.rank").alias("rank"),
        bucket.alias("bucket"),
    )
    match_edges = matches.join(
        cc.select(F.col("id").alias("id1"), "component"), "id1"
    ).select(bucket.alias("ebucket"), "id1", "id2")
    assigned = (
        members.groupBy("bucket")
        .cogroup(match_edges.groupBy("ebucket"))
        .applyInPandas(
            lambda left, right: _greedy_replay_cogroup(left, right),
            schema=CLUSTER_ASSIGN_SCHEMA,
        )
    ).localCheckpoint(eager=True)
    t0 = mark(f"D greedy replay assigned ({assigned.count()} rows)", t0)

    with_cluster = entities_raw.join(assigned, "entity_id", "left").select(
        "entity_id",
        "name",
        "entity_type",
        "confidence",
        F.coalesce("cluster_id", F.col("entity_id")).alias("cluster_id"),
    )
    canonical = with_cluster.groupBy("cluster_id").agg(
        F.max_by("name", F.struct("confidence", "entity_id")).alias("_cn"),
        F.max("confidence").alias("cluster_confidence"),
        F.count(F.lit(1)).alias("member_count"),
    )
    clusters = (
        with_cluster.join(canonical, "cluster_id")
        .select(
            "entity_id",
            "cluster_id",
            F.col("_cn").alias("canonical_name"),
            "entity_type",
            "confidence",
            "cluster_confidence",
            "member_count",
        )
    ).cache()
    n = clusters.count()
    t0 = mark(f"E clusters cache ({n} rows)", t0)

    edges_raw = edges_raw_table(extraction, cfg.relationship_confidence)
    nodes, edges, node_stats = materialize_graph(
        edges_raw, clusters, entities_raw, cfg, cache_intermediate=True
    )
    n = edges.count()
    t0 = mark(f"F edges materialize ({n})", t0)
    n = nodes.count()
    t0 = mark(f"G nodes ({n})", t0)
    n = clusters.select(F.countDistinct("cluster_id")).collect()[0][0]
    t0 = mark(f"H distinct clusters ({n})", t0)
    print(f"[{CPUS}c] TOTAL timed: {time.perf_counter() - T0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
