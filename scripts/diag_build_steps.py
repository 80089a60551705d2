"""Eager-step timing replicating build_graph's exact sequencing.

    N_CONVS=25000 CPUS=16 taskset -c 0-15 python scripts/diag_build_steps.py
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


def mark(label, t0):
    t1 = time.perf_counter()
    print(f"{label}: {t1 - t0:.1f}s", flush=True)
    return time.perf_counter()


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("diag-build-steps")
        .config("spark.local.dir", "/dev/shm/spark-graft-local")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.default.parallelism", str(CPUS))
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
    from graphrag_rs_spark.operators.canonicalize import (
        candidate_pairs,
        score_pairs,
    )
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import (
        entities_raw_table,
        extract_chunks,
    )
    from graphrag_rs_spark.operators.graph import connected_components

    tune_object_agg(spark)
    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4, vocab=vocab
    ).cache()
    t0 = time.perf_counter()
    transcripts.count()
    t0 = mark("transcripts gen+cache", t0)

    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    documents = assemble_documents(transcripts, separator=cfg.turn_separator)
    chunks = chunk_documents(documents, cfg).repartition(CPUS * 4)
    extraction = extract_chunks(chunks, cfg).cache()
    entities_raw = entities_raw_table(extraction).cache()
    entities_raw.count()
    t0 = mark("entities_raw populate (assembly+chunk+extract+rollup)", t0)

    pairs = candidate_pairs(entities_raw, cfg)
    matches = score_pairs(pairs, cfg).localCheckpoint(eager=True)
    t0 = mark(f"matches checkpoint ({matches.count()} rows)", t0)

    cc = connected_components(matches, src="id1", dst="id2").localCheckpoint(
        eager=True
    )
    t0 = mark(f"cc checkpoint ({cc.count()} rows)", t0)

    # greedy replay + cluster build (the lazy tail of canonicalize)
    from graphrag_rs_spark.operators.canonicalize import canonicalize_entities

    clusters = canonicalize_entities(entities_raw, cfg).cache()
    n = clusters.count()
    t0 = mark(f"canonicalize_entities FULL rerun + cache ({n})", t0)

    from graphrag_rs_spark.operators.materialize import materialize_graph
    from graphrag_rs_spark.operators.extraction import edges_raw_table

    edges_raw = edges_raw_table(extraction, cfg.relationship_confidence)
    nodes, edges, node_stats = materialize_graph(
        edges_raw, clusters, entities_raw, cfg
    )
    n = edges.count()
    t0 = mark(f"edges materialize ({n})", t0)
    n = nodes.count()
    t0 = mark(f"nodes ({n})", t0)
    n = node_stats.count()
    t0 = mark(f"node_stats ({n})", t0)
    spark.stop()


if __name__ == "__main__":
    main()
