"""Checkpoint / lineage / exact-resume semantics (north rule: each stage
checkpoints with per-partition lineage and metrics for exact resume)."""

import pytest

from graphrag_rs_spark.config import PipelineConfig
from graphrag_rs_spark.fixtures import transcripts_df
from graphrag_rs_spark.plans.checkpoint import CheckpointManager
from graphrag_rs_spark.plans.pipeline import build_graph


@pytest.fixture(scope="module")
def transcripts(spark):
    df = transcripts_df(spark, 12, seed=42, mega_every=0)
    df = df.cache()
    df.count()
    return df


def _triples(tables):
    return {
        (r["subj"], r["pred"], r["obj"]) for r in tables["edges"].collect()
    }


def test_checkpointed_build_matches_direct(spark, transcripts, tmp_path):
    cfg = PipelineConfig()
    direct = build_graph(spark, transcripts, cfg)
    ckpt = build_graph(spark, transcripts, cfg, checkpoint_dir=str(tmp_path / "ck"))
    assert _triples(direct) == _triples(ckpt)


def test_resume_skips_completed_stages(spark, transcripts, tmp_path):
    cfg = PipelineConfig()
    d = str(tmp_path / "ck2")
    first = build_graph(spark, transcripts, cfg, checkpoint_dir=d)
    mgr1: CheckpointManager = first["_checkpoint"]
    assert mgr1.stages_computed and not mgr1.stages_resumed

    second = build_graph(spark, transcripts, cfg, checkpoint_dir=d)
    mgr2: CheckpointManager = second["_checkpoint"]
    assert not mgr2.stages_computed, "identical config+input must fully resume"
    assert set(mgr2.stages_resumed) >= {"documents", "chunks", "extraction"}
    assert _triples(first) == _triples(second)


def test_config_change_invalidates_downstream(spark, transcripts, tmp_path):
    d = str(tmp_path / "ck3")
    build_graph(spark, transcripts, PipelineConfig(), checkpoint_dir=d)
    changed = build_graph(
        spark, transcripts, PipelineConfig(chunk_size=500), checkpoint_dir=d
    )
    mgr: CheckpointManager = changed["_checkpoint"]
    assert "chunks" in mgr.stages_computed, "changed chunk_size must recompute chunks"
    assert "extraction" in mgr.stages_computed, "and everything downstream"


def test_lineage_rows_and_manifest(spark, transcripts, tmp_path):
    d = str(tmp_path / "ck4")
    tables = build_graph(spark, transcripts, PipelineConfig(), checkpoint_dir=d)
    mgr: CheckpointManager = tables["_checkpoint"]
    lin = mgr.lineage("chunks").collect()
    assert lin, "per-partition lineage rows must exist"
    total = sum(r["row_count"] for r in lin)
    assert total == tables["chunks"].count()
    man = mgr.manifest("chunks")
    assert man["committed"] and man["row_count"] == total
    assert man["wall_ms"] >= 0


def test_rollback_forces_recompute(spark, transcripts, tmp_path):
    d = str(tmp_path / "ck5")
    tables = build_graph(spark, transcripts, PipelineConfig(), checkpoint_dir=d)
    mgr: CheckpointManager = tables["_checkpoint"]
    mgr.rollback("extraction")
    again = build_graph(spark, transcripts, PipelineConfig(), checkpoint_dir=d)
    mgr2: CheckpointManager = again["_checkpoint"]
    assert "extraction" in mgr2.stages_computed
    assert "documents" in mgr2.stages_resumed and "chunks" in mgr2.stages_resumed


def test_validate_detects_partition_damage(spark, transcripts, tmp_path):
    """Per-partition lineage validation: intact snapshot -> empty report;
    damaged data file -> the affected partition surfaces."""
    import glob
    import os

    cfg = PipelineConfig()
    ckpt_dir = str(tmp_path / "ckpt")
    tables = build_graph(spark, transcripts, cfg, checkpoint_dir=ckpt_dir)
    tables["edges"].count()
    mgr: CheckpointManager = tables["_checkpoint"]

    assert mgr.validate("documents").count() == 0

    # corrupt the snapshot: delete one data file
    files = sorted(
        glob.glob(os.path.join(ckpt_dir, "documents", "data", "part-*.parquet"))
    )
    assert files
    os.remove(files[0])
    report = mgr.validate("documents")
    assert report.count() > 0
    assert {r["problem"] for r in report.collect()} <= {
        "missing_or_changed", "unexpected"
    }
