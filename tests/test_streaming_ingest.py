"""Structured Streaming incremental ingest: two file drops → two
micro-batches → merged workspace equals the batch build over the union
(the reference's incremental-equals-rebuild invariant,
examples/MULTI_DOCUMENT_PIPELINE.md semantics)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.fixtures import transcripts_df
from graphrag_rs_spark.streaming.ingest import run_incremental_ingest


@pytest.mark.slow
def test_incremental_ingest_matches_union(spark, tmp_path):
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    cfg = PipelineConfig()

    batch1 = transcripts_df(spark, 10, seed=1)
    batch2 = transcripts_df(spark, 10, seed=99)
    # distinct conv ids per drop so the two batches are disjoint docs
    batch2 = batch2.withColumn(
        "conv_id", F.concat(F.lit("x"), F.col("conv_id"))
    )

    batch1.write.mode("overwrite").parquet(str(in_dir / "drop1"))
    run_incremental_ingest(
        spark, str(in_dir) + "/*", str(tmp_path / "ws"), str(tmp_path / "ckpt"), cfg
    )
    batch2.write.mode("overwrite").parquet(str(in_dir / "drop2"))
    run_incremental_ingest(
        spark, str(in_dir) + "/*", str(tmp_path / "ws"), str(tmp_path / "ckpt"), cfg
    )

    inc_nodes = spark.read.parquet(str(tmp_path / "ws" / "entities"))
    inc_edges = spark.read.parquet(str(tmp_path / "ws" / "relationships"))

    from graphrag_rs_spark.plans.pipeline import build_graph

    full = build_graph(spark, batch1.unionByName(batch2), cfg)

    # raw-table merge is associative and the greedy replay orders by the
    # global first-appearance key, so incremental must equal rebuild EXACTLY
    inc_ids = {r["cluster_id"] for r in inc_nodes.select("cluster_id").collect()}
    full_ids = {r["cluster_id"] for r in full["nodes"].select("cluster_id").collect()}
    assert inc_ids == full_ids

    inc_triples = {
        (r["subj"], r["pred"], r["obj"])
        for r in inc_edges.select("subj", "pred", "obj").collect()
    }
    full_triples = {
        (r["subj"], r["pred"], r["obj"])
        for r in full["edges"].select("subj", "pred", "obj").collect()
    }
    assert inc_triples == full_triples


def test_replayed_batch_is_skipped(spark, tmp_path):
    """At-least-once delivery: re-processing an already-published batch_id
    must be a no-op (no double-merged mention counts), and the workspace
    must stay internally consistent (single atomic CURRENT flip)."""
    from graphrag_rs_spark.streaming.ingest import IncrementalGraphSink

    cfg = PipelineConfig()
    sink = IncrementalGraphSink(str(tmp_path / "ws"), cfg)
    batch = transcripts_df(spark, 5, seed=7)

    sink.process_batch(batch, batch_id=0)
    first = {
        r["entity_id"]: r["mention_count"]
        for r in spark.read.parquet(str(tmp_path / "ws" / "entities_raw")).collect()
    }
    assert first

    # crash-replay of the same batch id: must be skipped entirely
    sink.process_batch(batch, batch_id=0)
    replayed = {
        r["entity_id"]: r["mention_count"]
        for r in spark.read.parquet(str(tmp_path / "ws" / "entities_raw")).collect()
    }
    assert replayed == first, "replay double-merged the batch"

    # a genuinely new batch advances CURRENT and merges
    nxt = transcripts_df(spark, 5, seed=11).withColumn(
        "conv_id", F.concat(F.lit("y"), F.col("conv_id"))
    )
    sink.process_batch(nxt, batch_id=1)
    assert sink._current_batch_id() == 1
    merged = spark.read.parquet(str(tmp_path / "ws" / "entities_raw"))
    assert merged.count() >= len(first)

    # a REGRESSED batch id means the stream checkpoint restarted against
    # this workspace: silently skipping would drop new data, applying
    # would double-merge — the sink must refuse loudly instead
    with pytest.raises(RuntimeError, match="checkpoint"):
        sink.process_batch(batch, batch_id=0)


def test_stable_symlinks_survive_relative_workspace_dir(spark, tmp_path):
    """The published top-level table paths are symlinks into the version
    dir; their targets must be RELATIVE so a relative workspace_dir (or a
    moved workspace) does not leave them dangling."""
    from graphrag_rs_spark.streaming.ingest import IncrementalGraphSink

    cfg = PipelineConfig()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sink = IncrementalGraphSink("ws_rel", cfg)  # RELATIVE path
        sink.process_batch(transcripts_df(spark, 4, seed=3), batch_id=0)
        link = tmp_path / "ws_rel" / "entities"
        assert os.path.islink(link)
        assert not os.path.isabs(os.readlink(link))
        assert os.path.exists(link)  # resolves (would dangle if doubled)
        assert spark.read.parquet(str(link)).count() > 0
    finally:
        os.chdir(cwd)
