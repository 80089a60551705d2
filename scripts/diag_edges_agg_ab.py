"""Interleaved A/B: int-coded vs string-keyed edge-dedupe aggregation.

    N_CONVS=25000 CPUS=16 REPS=2 taskset -c 0-15 python scripts/diag_edges_agg_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

N = int(os.environ.get("N_CONVS", "25000"))
CPUS = int(os.environ.get("CPUS", "16"))
REPS = int(os.environ.get("REPS", "2"))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("diag-edges-agg-ab")
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

    from pyspark.sql import functions as F

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
    from graphrag_rs_spark.operators.materialize import repoint_edges

    tune_object_agg(spark)
    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4, vocab=vocab
    )
    documents = assemble_documents(transcripts, separator="\n")
    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    chunks = chunk_documents(documents, cfg).repartition(CPUS * 4)
    extraction = extract_chunks(chunks, cfg).cache()
    entities = entities_raw_table(extraction).cache()
    entities.count()
    clusters = canonicalize_entities(entities, cfg).localCheckpoint(eager=True)
    print(f"clusters: {clusters.count()}", flush=True)
    edges_raw = edges_raw_table(extraction, cfg.relationship_confidence)

    sigs = {}
    for r in range(REPS):
        for name, coded in (("int-coded", True), ("string-keyed", False)):
            t0 = time.perf_counter()
            edges = repoint_edges(
                edges_raw, clusters,
                relationship_confidence=cfg.relationship_confidence,
                int_coded_agg=coded,
            )
            n = edges.count()
            t1 = time.perf_counter()
            sig = edges.agg(
                F.expr(
                    "bit_xor(xxhash64(subj, pred, obj, cast(confidence as string),"
                    " array_join(context, ',')))"
                ).alias("h")
            ).collect()[0]["h"]
            sigs.setdefault(name, set()).add((n, sig))
            print(
                f"rep{r} {name}: edges={n} wall={t1 - t0:.1f}s sig={sig}",
                flush=True,
            )
    assert sigs["int-coded"] == sigs["string-keyed"], f"MISMATCH: {sigs}"
    print("outputs identical across paths", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
