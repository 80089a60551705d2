"""Relational query algebra over the materialized graph
(graphrag-rs query/optimizer.rs:17-73) compiled to DataFrame plans.

The reference defines ``QueryOp::{EntityScan, Filter, Join, Neighbors,
Union, Limit}`` with a hand-rolled greedy cost model (optimizer.rs:
88-510). On Spark the cost-based work — join reordering, filter pushdown,
cardinality estimation — is Catalyst/AQE's job (SURVEY.md §4.1), so this
module only COMPILES the algebra; it deliberately performs no manual
optimization. ``explain()`` is ``df.explain`` itself.

Ops are plain nested dataclasses; ``compile_op`` turns one into a
DataFrame over a ``GraphTables`` pair (nodes, edges). ``Neighbors`` is
the iterative k-hop expansion from operators/traversal.py with an
optional relation-type filter (optimizer.rs:40-47).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GraphTables:
    nodes: DataFrame  # at least (cluster_id, name, entity_type, confidence)
    edges: DataFrame  # at least (subj, pred, obj, confidence)


class QueryOp:  # marker base
    pass


@dataclass(frozen=True)
class EntityScan(QueryOp):
    entity_type: str


@dataclass(frozen=True)
class Filter(QueryOp):
    source: "QueryOp"
    property: str
    value: str


@dataclass(frozen=True)
class Join(QueryOp):
    left: "QueryOp"
    right: "QueryOp"
    join_type: str = "inner"  # inner | left_outer | cross


@dataclass(frozen=True)
class Neighbors(QueryOp):
    source: "QueryOp"
    relation_type: str | None = None
    max_hops: int = 1


@dataclass(frozen=True)
class Union(QueryOp):
    left: "QueryOp"
    right: "QueryOp"


@dataclass(frozen=True)
class Limit(QueryOp):
    source: "QueryOp"
    count: int


_JOIN_HOW = {"inner": "inner", "left_outer": "left", "cross": "cross"}


def compile_op(op: QueryOp, tables: GraphTables, broadcast_if=None) -> DataFrame:
    """QueryOp tree → DataFrame of node rows (id column ``cluster_id``).

    ``broadcast_if(sub_op) -> bool`` (optional, supplied by
    plans/optimizer.py) hints ``F.broadcast`` on a join's right side when
    the cost model proves it small — AQE can't see through a multi-stage
    sub-plan (e.g. an iterated Neighbors) before its shuffle materializes.
    """
    nodes, edges = tables.nodes, tables.edges

    if isinstance(op, EntityScan):
        return nodes.where(F.col("entity_type") == op.entity_type)

    if isinstance(op, Filter):
        src = compile_op(op.source, tables, broadcast_if)
        # reference matches string equality on a property (optimizer.rs:24-31)
        return src.where(F.col(op.property).cast("string") == op.value)

    if isinstance(op, Join):
        left = compile_op(op.left, tables, broadcast_if)
        right = compile_op(op.right, tables, broadcast_if)
        if broadcast_if is not None and broadcast_if(op.right):
            right = F.broadcast(right)
        how = _JOIN_HOW[op.join_type]
        if how == "cross":
            return left.crossJoin(
                right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
            )
        # Inner = intersection on entity identity (optimizer.rs:66-68)
        return left.join(right.select("cluster_id"), "cluster_id", how)

    if isinstance(op, Neighbors):
        src = compile_op(op.source, tables, broadcast_if)
        e = edges
        if op.relation_type is not None:
            e = e.where(F.col("pred") == op.relation_type)
        from graphrag_rs_spark.operators.traversal import bfs_distances

        reach = bfs_distances(
            e, src.select("cluster_id"), max_depth=op.max_hops,
            src="subj", dst="obj", confidence=None,
        ).where(F.col("distance") > 0)
        return nodes.join(
            reach.withColumnRenamed("id", "cluster_id"), "cluster_id", "left_semi"
        )

    if isinstance(op, Union):
        left = compile_op(op.left, tables, broadcast_if)
        right = compile_op(op.right, tables, broadcast_if)
        return left.unionByName(right).dropDuplicates(["cluster_id"])

    if isinstance(op, Limit):
        return compile_op(op.source, tables, broadcast_if).limit(op.count)

    raise TypeError(f"unknown op {type(op).__name__}")
