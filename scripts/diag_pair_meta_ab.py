"""Interleaved A/B: broadcast vs shuffle joins for the pair-scorer meta.

    N_CONVS=25000 CPUS=16 REPS=2 taskset -c 0-15 python scripts/diag_pair_meta_ab.py
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
        .appName("diag-pair-meta-ab")
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
    from graphrag_rs_spark.operators.canonicalize import (
        candidate_pairs,
        score_pairs,
    )
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import (
        entities_raw_table,
        extract_chunks,
    )

    tune_object_agg(spark)
    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4, vocab=vocab
    )
    documents = assemble_documents(transcripts, separator="\n")
    base = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    chunks = chunk_documents(documents, base).repartition(CPUS * 4)
    extraction = extract_chunks(chunks, base)
    entities = entities_raw_table(extraction).localCheckpoint(eager=True)
    print(f"entities: {entities.count()}", flush=True)

    configs = {
        "bcast": base,  # broadcast_pair_meta defaults True
        "shuffle": PipelineConfig(
            shuffle_partitions=CPUS,
            min_shared_blocks=2,
            broadcast_pair_meta=False,
        ),
    }
    sigs = {}
    for r in range(REPS):
        for name, cfg in configs.items():
            t0 = time.perf_counter()
            matches = score_pairs(
                candidate_pairs(entities, cfg), cfg
            ).localCheckpoint(eager=True)
            nm = matches.count()
            t1 = time.perf_counter()
            sig = matches.agg(
                F.expr("bit_xor(xxhash64(id1, id2))").alias("h"),
                F.expr(
                    "bit_xor(xxhash64(id1, id2, cast(round(score * 10000) as long)))"
                ).alias("s"),
            ).collect()[0]
            sigs.setdefault(name, set()).add((nm, sig["h"], sig["s"]))
            print(
                f"rep{r} {name}: matches={nm} wall={t1 - t0:.1f}s "
                f"sig=({sig['h']},{sig['s']})",
                flush=True,
            )
    assert sigs["bcast"] == sigs["shuffle"], f"OUTPUT MISMATCH: {sigs}"
    print("outputs identical across configs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
