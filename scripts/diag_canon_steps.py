"""Sub-step timing for canonicalization + explode pathologies.

    N_CONVS=25000 CPUS=16 taskset -c 0-15 python scripts/diag_canon_steps.py
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
        .appName("diag-canon-steps")
        .config("spark.local.dir", "/dev/shm/spark-graft-local")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.default.parallelism", str(CPUS))
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
    from graphrag_rs_spark.operators.canonicalize import (
        blocking_keys,
        score_pairs,
    )
    from graphrag_rs_spark.operators.chunking import chunk_documents
    from graphrag_rs_spark.operators.extraction import (
        edges_raw_table,
        entities_raw_table,
        extract_chunks,
    )
    from graphrag_rs_spark.functions import normalize_name_col, tune_object_agg
    from graphrag_rs_spark.operators.graph import (
        _local_cc,
        _two_level_cc,
        connected_components,
    )

    tune_object_agg(spark)
    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    transcripts = transcripts_df(
        spark, N, seed=42, distributed=True, partitions=CPUS * 4, vocab=vocab
    ).cache()
    transcripts.count()
    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    documents = assemble_documents(transcripts, separator=cfg.turn_separator)
    chunks = chunk_documents(documents, cfg).repartition(CPUS * 4)
    extraction = extract_chunks(chunks, cfg).cache()
    t0 = time.perf_counter()
    n = extraction.count()
    t0 = mark(f"extraction ({n} chunks)", t0)

    # --- P1: explode cost, with vs without cache ---
    n = edges_raw_table(extraction, 0.5).count()
    t0 = mark(f"explode count NO cache ({n} rows)", t0)
    er = edges_raw_table(extraction, 0.5).cache()
    n = er.count()
    t0 = mark("explode count WITH cache write", t0)
    n = er.count()
    t0 = mark("explode re-count from cache", t0)
    er.unpersist()

    # re-scan extraction cache shape: count only sizes (no explode)
    n = extraction.agg(F.sum(F.size("triples"))).collect()[0][0]
    t0 = mark(f"sum(size(triples)) over cache ({n})", t0)

    # --- P2: candidate sub-steps ---
    entities = entities_raw_table(extraction).cache()
    n = entities.count()
    t0 = mark(f"entities roll-up ({n})", t0)

    keys = blocking_keys(entities).cache()
    n = keys.count()
    t0 = mark(f"blocking_keys UDF ({n} key rows)", t0)

    key_counts = keys.groupBy("block_key").agg(F.count(F.lit(1)).alias("cnt"))
    kind = F.substring(F.substring_index("block_key", "|", -1), 1, 1)
    cap = F.when(kind == "t", F.lit(cfg.max_block_size)).otherwise(
        F.lit(cfg.max_derived_block_size)
    )
    good = key_counts.where((F.col("cnt") > 1) & (F.col("cnt") <= cap)).select(
        "block_key"
    )
    kept = keys.join(good, "block_key").cache()
    n = kept.count()
    t0 = mark(f"key filter join ({n} kept key rows)", t0)

    left = kept.select("block_key", F.col("entity_id").alias("id1"))
    right = kept.select("block_key", F.col("entity_id").alias("id2"))
    joined = left.join(right, "block_key").where(F.col("id1") < F.col("id2"))
    n = joined.count()
    t0 = mark(f"block self-join ({n} raw pair rows)", t0)

    pairs_ids = (
        joined.groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("_nk"))
        .where(F.col("_nk") >= cfg.min_shared_blocks)
        .select("id1", "id2")
        .cache()
    )
    n = pairs_ids.count()
    t0 = mark(f"pair dedupe+min_shared ({n} pairs)", t0)

    meta = entities.select(
        "entity_id",
        "entity_type",
        normalize_name_col(F.col("name")).alias("norm_name"),
    )
    pairs = (
        pairs_ids.join(
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
        .cache()
    )
    n = pairs.count()
    t0 = mark(f"meta joins ({n} pair rows)", t0)

    matches = score_pairs(pairs, cfg).localCheckpoint(eager=True)
    n = matches.count()
    t0 = mark(f"scoring ({n} matches)", t0)

    # --- P3: CC variants on the match edges ---
    e_dedup = matches.select("id1", "id2").distinct()
    n = e_dedup.count()
    t0 = mark(f"probe distinct count ({n})", t0)
    n = _local_cc(e_dedup, "id1", "id2").count()
    t0 = mark("local_cc", t0)
    n = _two_level_cc(e_dedup, "id1", "id2").count()
    t0 = mark("two_level_cc", t0)
    n = connected_components(matches, "id1", "id2").count()
    t0 = mark("connected_components auto", t0)
    spark.stop()


if __name__ == "__main__":
    main()
