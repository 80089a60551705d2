"""Diagnose blocking-key block-size distribution and candidate-pair volume.

Answers: where does the candidate self-join volume come from (key kind ×
block size), and what do cap / min_shared_blocks settings buy at scale.

    N_CONVS=100000 CPUS=32 python scripts/diag_blocking.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(os.environ.get("N_CONVS", "100000"))
CPUS = int(os.environ.get("CPUS", "32"))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("diag-blocking")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.fixtures import ScaledVocab, transcripts_df
    from graphrag_rs_spark.operators.assembly import assemble_documents
    from graphrag_rs_spark.operators.canonicalize import blocking_keys
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import (
        entities_raw_table,
        extract_chunks,
    )

    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4, vocab=vocab
    )
    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    documents = assemble_documents(transcripts, separator=cfg.turn_separator)
    chunks = chunk_documents(documents, cfg)
    extraction = extract_chunks(chunks, cfg)
    entities = entities_raw_table(extraction).cache()
    t0 = time.perf_counter()
    n_ent = entities.count()
    print(f"entities: {n_ent} ({time.perf_counter()-t0:.1f}s)", flush=True)

    keys = blocking_keys(entities).cache()
    n_keys = keys.count()
    print(f"key rows: {n_keys}", flush=True)

    # block-size distribution by key kind (kind = t/s/g marker)
    sizes = (
        keys.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("kind", F.regexp_extract("block_key", r"\|(\w):", 1))
        .cache()
    )
    dist = (
        sizes.withColumn(
            "bucket",
            F.when(F.col("n") == 1, "1")
            .when(F.col("n") <= 16, "2-16")
            .when(F.col("n") <= 64, "17-64")
            .when(F.col("n") <= 256, "65-256")
            .when(F.col("n") <= 1024, "257-1024")
            .otherwise(">1024 (dropped)"),
        )
        .groupBy("kind", "bucket")
        .agg(
            F.count(F.lit(1)).alias("blocks"),
            F.sum("n").alias("key_rows"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
        )
        .orderBy("kind", "bucket")
    )
    dist.show(60, truncate=False)

    # total self-join volume (sum of C(n,2) over kept blocks) per cap
    for cap in (1024, 256, 128, 64):
        row = (
            sizes.where((F.col("n") > 1) & (F.col("n") <= cap))
            .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"))
            .collect()[0]
        )
        print(f"cap={cap}: join pairs={int(row['pairs'] or 0):,}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
