"""Per-stage wall-time profile of the KG build (bench diagnosis)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

N = int(os.environ.get("N_CONVS", "60"))
CPUS = int(os.environ.get("CPUS", "8"))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile")
        .config("spark.local.dir", "/dev/shm/spark-graft-local")
        .config("spark.sql.shuffle.partitions", str(CPUS * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graphrag_rs_spark.config import PipelineConfig
    from graphrag_rs_spark.fixtures import ScaledVocab, transcripts_df
    from graphrag_rs_spark.plans.pipeline import build_graph

    t0 = time.perf_counter()
    # same scaled vocabulary as bench.py so canonicalization/CC run at
    # non-toy graph sizes during profiling
    vocab = ScaledVocab(n_persons=max(50, N // 2), n_orgs=max(20, N // 5))
    transcripts = transcripts_df(spark, N, seed=42, distributed=True,
                                 partitions=CPUS * 2, vocab=vocab).cache()
    n_turns = transcripts.count()
    print(f"gen+cache: {time.perf_counter()-t0:.1f}s ({n_turns} turns)")

    cfg = PipelineConfig(shuffle_partitions=CPUS, min_shared_blocks=2)
    marks = [("build_graph() call (incl. eager CC)", None)]
    t0 = time.perf_counter()
    tables = build_graph(spark, transcripts, cfg)
    t1 = time.perf_counter()
    print(f"build_graph plan construction (eager CC inside): {t1-t0:.1f}s")

    for name in ["documents", "chunks", "extraction", "entities_raw",
                 "edges_raw", "clusters", "nodes", "edges", "node_stats"]:
        t0 = time.perf_counter()
        n = tables[name].count()
        print(f"{name}: {time.perf_counter()-t0:.1f}s ({n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
