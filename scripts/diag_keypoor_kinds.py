"""Which block kinds admit keypoor pairs, and what do they yield?

    N_CONVS=25000 CPUS=16 taskset -c 0-15 python scripts/diag_keypoor_kinds.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(os.environ.get("N_CONVS", "25000"))
CPUS = int(os.environ.get("CPUS", "16"))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("diag-keypoor-kinds")
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
    from graphrag_rs_spark.operators.assembly import assemble_documents
    from graphrag_rs_spark.operators.canonicalize import (
        blocking_keys,
        score_pairs,
    )
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
    documents = assemble_documents(transcripts, separator="\n")
    chunks = chunk_documents(documents, cfg).repartition(CPUS * 4)
    extraction = extract_chunks(chunks, cfg)
    entities = entities_raw_table(extraction).localCheckpoint(eager=True)

    keys = blocking_keys(entities).localCheckpoint(eager=True)
    kind = F.substring(F.substring_index("block_key", "|", -1), 1, 1)
    keys = keys.withColumn("kind", kind)

    # pairwise co-occurrence within usable blocks (self-join fine for diag)
    counts = keys.groupBy("block_key").agg(F.count(F.lit(1)).alias("_n"))
    cap = F.when(
        F.substring(F.substring_index("block_key", "|", -1), 1, 1) == "t",
        F.lit(cfg.max_block_size),
    ).otherwise(F.lit(cfg.max_derived_block_size))
    ok = counts.where((F.col("_n") > 1) & (F.col("_n") <= cap)).select("block_key")
    k = keys.join(ok, "block_key")
    left = k.select(
        "block_key", "kind",
        F.col("entity_id").alias("id1"), F.col("n_keys").alias("nk1"),
    )
    right = k.select(
        "block_key",
        F.col("entity_id").alias("id2"), F.col("n_keys").alias("nk2"),
    )
    raw = left.join(right, "block_key").where(F.col("id1") < F.col("id2"))
    agg = (
        raw.groupBy("id1", "id2")
        .agg(
            F.count(F.lit(1)).alias("_nk"),
            F.max(F.col("kind") != "s").alias("_shared_tg"),
            F.min(F.least("nk1", "nk2")).alias("_minkeys"),
        )
        .localCheckpoint(eager=True)
    )
    poor = agg.where(
        (F.col("_nk") < cfg.min_shared_blocks)
        & (F.col("_minkeys") <= cfg.key_poor_max_keys)
    )
    print("keypoor-admitted pairs (nk<2, minkeys<=4):", poor.count())
    byk = poor.groupBy("_shared_tg").count().collect()
    print("  by shared-kind (True = shares a t/g block):", byk)

    # score the keypoor pairs, split by kind
    meta = entities.selectExpr(
        "entity_id", "entity_type",
        "name",
    )
    from graphrag_rs_spark.functions import normalize_name_col
    meta = entities.select(
        "entity_id", "entity_type",
        normalize_name_col(F.col("name")).alias("norm_name"),
    )
    pairs = (
        poor.join(
            meta.select(
                F.col("entity_id").alias("id1"),
                F.col("entity_type").alias("type1"),
                F.col("norm_name").alias("norm1"),
            ),
            "id1",
        )
        .join(
            meta.select(
                F.col("entity_id").alias("id2"),
                F.col("entity_type").alias("type2"),
                F.col("norm_name").alias("norm2"),
            ),
            "id2",
        )
    )
    scored = score_pairs(pairs.select("id1", "id2", "type1", "norm1", "type2", "norm2", "_shared_tg"), cfg) \
        if False else None
    # score via the public scorer (needs its expected columns only)
    m = score_pairs(pairs, cfg)
    mk = m.join(poor.select("id1", "id2", "_shared_tg", "_minkeys"), ["id1", "id2"])
    print("keypoor matches by shared-kind:",
          mk.groupBy("_shared_tg").count().collect())
    print("keypoor matches by minkeys:",
          mk.groupBy("_minkeys").count().collect())
    samp = mk.where(~F.col("_shared_tg")).limit(10).collect()
    for r in samp:
        print("  s-only match:", r["id1"], "~", r["id2"])
    spark.stop()


if __name__ == "__main__":
    main()
