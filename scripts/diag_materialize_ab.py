"""A/B: materialize with shared cached flat `repointed` vs current double-scan.

    N_CONVS=25000 CPUS=16 taskset -c 0-15 python scripts/diag_materialize_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(os.environ.get("N_CONVS", "25000"))
CPUS = int(os.environ.get("CPUS", "16"))
REPS = int(os.environ.get("REPS", "2"))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("diag-materialize-ab")
        .config("spark.local.dir", "/dev/shm/spark-graft-local")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
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
    from graphrag_rs_spark.operators.canonicalize import canonicalize_entities
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import (
        edges_raw_table,
        entities_raw_table,
        extract_chunks,
    )
    from graphrag_rs_spark.operators.graph import communities, degrees
    from graphrag_rs_spark.operators.materialize import (
        materialize_graph,
        nodes_table,
        repoint_edges,
        repointed_occurrences,
    )

    tune_object_agg(spark)
    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4, vocab=vocab
    )
    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    documents = assemble_documents(transcripts, separator="\n")
    chunks = chunk_documents(documents, cfg).repartition(CPUS * 4)
    extraction = extract_chunks(chunks, cfg).cache()
    entities_raw = entities_raw_table(extraction).cache()
    entities_raw.count()
    clusters = canonicalize_entities(entities_raw, cfg).cache()
    clusters.count()
    edges_raw = edges_raw_table(extraction, cfg.relationship_confidence)

    for r in range(REPS):
        # --- A: current path ---
        t0 = time.perf_counter()
        nodes, edges, node_stats = materialize_graph(
            edges_raw, clusters, entities_raw, cfg
        )
        ne = edges.count()
        t1 = time.perf_counter()
        nn = nodes.count()
        ns = node_stats.count()
        t2 = time.perf_counter()
        print(
            f"rep{r} A current: edges={ne} ({t1 - t0:.1f}s) "
            f"nodes+stats ({t2 - t1:.1f}s)",
            flush=True,
        )

        # --- B: shared cached flat repointed ---
        t0 = time.perf_counter()
        repointed, _ = repointed_occurrences(edges_raw, clusters)
        repointed = repointed.persist()
        nodes = nodes_table(clusters, entities_raw).cache()
        node_ids = nodes.select(F.col("cluster_id").alias("_nid"))

        def integrity(df):
            df = df.join(
                F.broadcast(node_ids), df["subj"] == F.col("_nid"), "left_semi"
            )
            return df.join(
                F.broadcast(node_ids), df["obj"] == F.col("_nid"), "left_semi"
            )

        edges_b = integrity(
            repointed.groupBy("subj", "pred", "obj").agg(
                F.max("confidence").alias("confidence"),
                F.array_sort(F.collect_set("context_chunk")).alias("context"),
            )
        )
        ne = edges_b.count()
        t1 = time.perf_counter()
        edge_keys = integrity(repointed.select("subj", "pred", "obj").distinct())
        deg = degrees(edge_keys, src="subj", dst="obj")
        comm = communities(edge_keys, src="subj", dst="obj")
        stats_b = (
            nodes.select("cluster_id")
            .join(deg, nodes["cluster_id"] == deg["id"], "left")
            .drop("id")
            .join(comm, nodes["cluster_id"] == comm["id"], "left")
            .drop("id")
        )
        nn = nodes.count()
        ns = stats_b.count()
        t2 = time.perf_counter()
        print(
            f"rep{r} B shared-cache: edges={ne} ({t1 - t0:.1f}s) "
            f"nodes+stats ({t2 - t1:.1f}s)",
            flush=True,
        )
        repointed.unpersist()
        nodes.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
