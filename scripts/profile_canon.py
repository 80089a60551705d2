"""Fine-grained wall-time attribution for the KG build (scaling diagnosis).

Times each eager phase separately — extraction, entity roll-up, edge
explode, blocking+candidate pairs, pair scoring, connected components,
greedy replay + canonical build, materialization — so a pinned 4-core vs
16-core comparison shows WHICH stage fails to scale. Run under taskset:

    taskset -c 0-3  python scripts/profile_canon.py   # CPUS=4
    taskset -c 0-15 python scripts/profile_canon.py   # CPUS=16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

N = int(os.environ.get("N_CONVS", "10000"))
CPUS = int(os.environ.get("CPUS", "16"))


def mark(label: str, t0: float) -> float:
    t1 = time.perf_counter()
    print(f"{label}: {t1 - t0:.1f}s", flush=True)
    return t1


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-canon")
        .config("spark.local.dir", "/dev/shm/spark-graft-local")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.default.parallelism", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.fixtures import ScaledVocab, transcripts_df
    from graphrag_rs_spark.operators.assembly import assemble_documents
    from graphrag_rs_spark.operators.canonicalize import (
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

    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    t0 = time.perf_counter()
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4, vocab=vocab
    ).cache()
    n_turns = transcripts.count()
    t0 = mark(f"gen+cache ({n_turns} turns)", t0)

    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    total0 = time.perf_counter()

    documents = assemble_documents(transcripts, separator=cfg.turn_separator)
    chunks = chunk_documents(documents, cfg).repartition(CPUS * 4)
    extraction = extract_chunks(chunks, cfg).cache()
    n = extraction.count()
    t0 = mark(f"assembly+chunking+extraction ({n} chunks)", t0)

    entities_raw = entities_raw_table(extraction).cache()
    n = entities_raw.count()
    t0 = mark(f"entities_raw roll-up ({n} entities)", t0)

    edges_raw = edges_raw_table(extraction, cfg.relationship_confidence).cache()
    n = edges_raw.count()
    t0 = mark(f"edges_raw explode ({n} triples)", t0)

    pairs = candidate_pairs(entities_raw, cfg).cache()
    n = pairs.count()
    t0 = mark(f"blocking+candidate_pairs ({n} pairs)", t0)

    matches = score_pairs(pairs, cfg).localCheckpoint(eager=True)
    n = matches.count()
    t0 = mark(f"pair scoring ({n} matches)", t0)

    cc = connected_components(matches, src="id1", dst="id2").localCheckpoint(
        eager=True
    )
    n = cc.count()
    t0 = mark(f"connected components ({n} members)", t0)

    # full canonicalize (re-runs matches/CC from its own plan; attribute
    # the remainder — greedy replay + canonical records — by difference
    from graphrag_rs_spark.operators.canonicalize import canonicalize_entities

    clusters = canonicalize_entities(entities_raw, cfg).cache()
    n = clusters.count()
    t0 = mark(f"canonicalize end-to-end incl. replay ({n} rows)", t0)

    nodes, edges, node_stats = materialize_graph(
        edges_raw, clusters, entities_raw, cfg, cache_intermediate=True
    )
    n1, n2 = nodes.count(), edges.count()
    t0 = mark(f"materialize nodes+edges ({n1} nodes, {n2} edges)", t0)
    n = node_stats.count()
    t0 = mark(f"node_stats ({n} rows)", t0)
    print(f"TOTAL build phases: {time.perf_counter() - total0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
