"""Incremental graph updates — the reference's GraphDelta/upsert semantics
(graphrag-rs graph/incremental.rs:92-341) as merge-style batch dataflow.

``merge_nodes`` / ``merge_edges`` implement the conflict strategies
(incremental.rs ConflictStrategy): LatestWins (new row wins),
HighestConfidence (max_by confidence), Merge (union mentions/contexts,
max confidence). On Iceberg these become ``MERGE INTO``; here they are
expressed as unionByName + groupBy so the same functions serve the parquet
stand-in and the oracle tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONFLICT_STRATEGIES = ("latest_wins", "highest_confidence", "merge")


def merge_nodes(
    existing: DataFrame, delta: DataFrame, strategy: str = "highest_confidence"
) -> DataFrame:
    """Upsert nodes keyed by cluster_id under a conflict strategy."""
    if strategy not in CONFLICT_STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}")
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        delta.withColumn("_src", F.lit(1))
    )
    if strategy == "latest_wins":
        pick = F.struct("_src")
    elif strategy == "highest_confidence":
        pick = F.struct("confidence", "_src")
    else:  # merge
        agg = tagged.groupBy("cluster_id").agg(
            F.max_by("name", F.struct("confidence", "_src")).alias("name"),
            F.first("entity_type").alias("entity_type"),
            F.max("confidence").alias("confidence"),
            F.sum("mention_count").alias("mention_count"),
            F.sum("member_count").alias("member_count"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("aliases")))
            ).alias("aliases"),
        )
        return agg
    cols = [c for c in existing.columns]
    winner = tagged.groupBy("cluster_id").agg(
        F.max_by(F.struct(*[c for c in tagged.columns if c != "cluster_id"]), pick).alias("w")
    )
    return winner.select(
        "cluster_id", *[F.col(f"w.{c}") for c in cols if c != "cluster_id"]
    )


def merge_edges(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Edge upsert keyed by (subj, pred, obj): max confidence, contexts
    unioned (the Merge strategy — edges have no latest-wins semantics in the
    reference, dedupe rule gleaning_extractor.rs:418-435)."""
    both = existing.unionByName(delta)
    return both.groupBy("subj", "pred", "obj").agg(
        F.max("confidence").alias("confidence"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("context")))).alias("context"),
    )


def change_log(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """added/removed rows between two snapshots — get_change_log(since)
    (incremental.rs:318-341) over table states."""
    k = [F.col(c) for c in key_cols]
    added = new.join(old, key_cols, "left_anti").select(
        F.lit("added").alias("op"), *k
    )
    removed = old.join(new, key_cols, "left_anti").select(
        F.lit("removed").alias("op"), *k
    )
    return added.unionByName(removed)
