"""Cost-based query optimizer over the QueryOp algebra
(graphrag-rs query/optimizer.rs:76-680).

Spark stance: Catalyst + AQE already perform filter pushdown, join
strategy selection, and runtime re-planning on the DataFrame plans that
``compile_op`` emits, so this module does NOT re-implement a physical
optimizer. It exists for two reasons:

1. **API parity** — ``QueryOptimizer::{optimize, estimate_cost, explain}``
   and ``GraphStatistics`` are user-visible reference surface
   (optimizer.rs:142-556); a user switching engines expects the same
   rewrites (smaller-side-first binary joins, greedy multi-way join
   ordering) and the same cost/cardinality/selectivity numbers.
2. **Broadcast hints Catalyst cannot derive** — the algebra's ``Join``
   sides are whole sub-plans (possibly an iterated ``Neighbors``
   expansion) whose size AQE only learns after materializing a shuffle;
   the reference's cardinality model lets us hint ``broadcast()`` on a
   provably-small side *before* execution (``plan``).

``GraphStatistics.from_tables`` computes the reference's stats
(optimizer.rs:100-137) as two distributed hash aggregations; the
collected result is bounded by the number of distinct entity /
relation types, never by graph size — safe at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from graphrag_rs_spark.plans.query_ops import (
    EntityScan,
    Filter,
    GraphTables,
    Join,
    Limit,
    Neighbors,
    QueryOp,
    Union,
    compile_op,
)


@dataclass(frozen=True)
class OperationCost:
    """Cost triple for one op (optimizer.rs:77-86)."""

    cardinality: int
    cost: float
    selectivity: float


@dataclass
class GraphStatistics:
    """Graph-level statistics driving the cost model (optimizer.rs:89-137)."""

    total_entities: int = 0
    entities_by_type: dict[str, int] = field(default_factory=dict)
    total_relationships: int = 0
    relationships_by_type: dict[str, int] = field(default_factory=dict)
    average_degree: float = 0.0

    @classmethod
    def from_tables(cls, nodes: DataFrame, edges: DataFrame) -> "GraphStatistics":
        """Distributed twin of ``GraphStatistics::from_graph``
        (optimizer.rs:101-137): two hash aggregations, each collected
        result one row per distinct type (bounded, small)."""
        type_counts = {
            r["entity_type"]: r["count"]
            for r in nodes.groupBy("entity_type").count().collect()
        }
        rel_counts = {
            r["pred"]: r["count"]
            for r in edges.groupBy("pred").count().collect()
        }
        total_entities = sum(type_counts.values())
        total_relationships = sum(rel_counts.values())
        # undirected-degree convention: each edge contributes 2 endpoint
        # slots (optimizer.rs:122-126)
        average_degree = (
            total_relationships * 2.0 / total_entities if total_entities else 0.0
        )
        return cls(
            total_entities=total_entities,
            entities_by_type=type_counts,
            total_relationships=total_relationships,
            relationships_by_type=rel_counts,
            average_degree=average_degree,
        )


class QueryOptimizer:
    """Rule-based optimizer with the reference's cost model
    (optimizer.rs:140-556). Numbers match the Rust implementation
    exactly, including integer truncation and the Union ``*9/10``
    overlap discount, so the ported unit vectors pin parity."""

    def __init__(self, stats: GraphStatistics) -> None:
        self.stats = stats

    # -- entry points ----------------------------------------------------

    def optimize(self, op: QueryOp) -> QueryOp:
        """rewrite (selectivity-ordered binary joins) then greedy
        multi-way join ordering (optimizer.rs:149-155)."""
        return self._optimize_joins(self._rewrite(op))

    def estimate_cost(self, op: QueryOp) -> OperationCost:
        """Cost model (optimizer.rs:372-510)."""
        stats = self.stats
        if isinstance(op, EntityScan):
            card = stats.entities_by_type.get(op.entity_type, 0)
            sel = card / stats.total_entities if stats.total_entities else 0.0
            return OperationCost(card, float(card), sel)

        if isinstance(op, Filter):
            # Reference's Filter is a leaf over the full entity table with
            # an assumed 10% selectivity (optimizer.rs:392-404); our Filter
            # wraps a source, so the same 10% applies to the input — the
            # two agree when the source is the full scan.
            src = self.estimate_cost(op.source)
            card = int(src.cardinality * 0.1)
            return OperationCost(card, src.cost + src.cardinality, 0.1)

        if isinstance(op, Join):
            left = self.estimate_cost(op.left)
            right = self.estimate_cost(op.right)
            if op.join_type == "inner":
                # geometric mean of the inputs (optimizer.rs:412-416)
                card = int((left.cardinality * right.cardinality) ** 0.5)
            elif op.join_type == "left_outer":
                card = left.cardinality
            else:  # cross
                card = left.cardinality * right.cardinality
            cost = left.cost + right.cost + left.cardinality * float(right.cardinality)
            return OperationCost(card, cost, left.selectivity * right.selectivity)

        if isinstance(op, Neighbors):
            src = self.estimate_cost(op.source)
            expansion = self.stats.average_degree ** op.max_hops
            card = int(
                min(src.cardinality * expansion, float(stats.total_entities))
            )
            sel = card / stats.total_entities if stats.total_entities else 0.0
            return OperationCost(card, src.cost + card, sel)

        if isinstance(op, Union):
            left = self.estimate_cost(op.left)
            right = self.estimate_cost(op.right)
            # overlap-discounted: Rust integer `(l + r) * 9 / 10`
            # (optimizer.rs:465-466)
            card = (left.cardinality + right.cardinality) * 9 // 10
            return OperationCost(
                card,
                left.cost + right.cost,
                min(left.selectivity + right.selectivity, 1.0),
            )

        if isinstance(op, Limit):
            src = self.estimate_cost(op.source)
            sel = (
                min(op.count / stats.total_entities, 1.0)
                if stats.total_entities
                else 0.0
            )
            return OperationCost(min(op.count, src.cardinality), src.cost, sel)

        raise TypeError(f"unknown op {type(op).__name__}")

    def explain(self, op: QueryOp) -> str:
        """Cost-annotated plan text, reference format
        (optimizer.rs:513-556 + 559-598)."""
        cost = self.estimate_cost(op)
        lines: list[str] = []
        self._explain(op, 0, lines)
        footer = (
            "\nEstimated Cost: {:.2f}\nEstimated Cardinality: {}\n"
            "Selectivity: {:.2f}%\n".format(
                cost.cost, cost.cardinality, cost.selectivity * 100.0
            )
        )
        return "\n".join(lines) + "\n" + footer

    def plan(
        self,
        op: QueryOp,
        tables: GraphTables,
        broadcast_row_threshold: int = 500_000,
    ) -> DataFrame:
        """Optimize then compile, hinting ``broadcast()`` on any join side
        whose estimated cardinality is below the threshold. The join sides
        compile to ids-only projections (~40-80 B/row), so 500k rows is
        tens of MB — comfortably broadcastable on a real cluster."""
        optimized = self.optimize(op)
        return compile_op(
            optimized,
            tables,
            broadcast_if=lambda sub: 0
            < self.estimate_cost(sub).cardinality
            <= broadcast_row_threshold,
        )

    # -- rewrite pass (optimizer.rs:158-231) -----------------------------

    def _rewrite(self, op: QueryOp) -> QueryOp:
        if isinstance(op, Join):
            left = self._rewrite(op.left)
            right = self._rewrite(op.right)
            # smaller (more selective) operand first for hash joins
            # (optimizer.rs:177-196); left-outer is side-sensitive, keep it
            if (
                op.join_type != "left_outer"
                and self.estimate_cost(left).cardinality
                > self.estimate_cost(right).cardinality
            ):
                left, right = right, left
            return Join(left, right, op.join_type)
        if isinstance(op, Filter):
            return Filter(self._rewrite(op.source), op.property, op.value)
        if isinstance(op, Neighbors):
            return Neighbors(self._rewrite(op.source), op.relation_type, op.max_hops)
        if isinstance(op, Union):
            return Union(self._rewrite(op.left), self._rewrite(op.right))
        if isinstance(op, Limit):
            return Limit(self._rewrite(op.source), op.count)
        return op

    # -- greedy multi-way join ordering (optimizer.rs:234-368) -----------

    def _optimize_joins(self, op: QueryOp) -> QueryOp:
        if isinstance(op, Join):
            left = self._optimize_joins(op.left)
            right = self._optimize_joins(op.right)
            # Greedy multi-way reordering is only sound for pure-inner
            # subtrees: every operand compiles to a same-schema subset of
            # the node table, so inner joins are set intersections —
            # commutative and associative. left_outer is side-sensitive
            # and cross changes both schema and cardinality, so those
            # subtrees are kept as leaves. NOTE deliberate divergence from
            # the reference here: optimizer.rs:244-259 flattens through
            # ANY nested join and rebuilds every pair with the OUTER
            # join_type, silently converting a nested left_outer/cross to
            # inner — a result-changing quirk we do not reproduce because
            # plan() executes the optimized tree.
            if op.join_type == "inner":
                operands: list[QueryOp] = []
                self._collect_join_operands(left, operands)
                self._collect_join_operands(right, operands)
                if len(operands) > 2:
                    return self._greedy_join_order(operands, op.join_type)
            return Join(left, right, op.join_type)
        if isinstance(op, Filter):
            return Filter(self._optimize_joins(op.source), op.property, op.value)
        if isinstance(op, Neighbors):
            return Neighbors(
                self._optimize_joins(op.source), op.relation_type, op.max_hops
            )
        if isinstance(op, Union):
            return Union(self._optimize_joins(op.left), self._optimize_joins(op.right))
        if isinstance(op, Limit):
            return Limit(self._optimize_joins(op.source), op.count)
        return op

    def _collect_join_operands(self, op: QueryOp, out: list[QueryOp]) -> None:
        # flatten only through inner joins; any other join is an operand
        # (see _optimize_joins for the reference-divergence rationale)
        if isinstance(op, Join) and op.join_type == "inner":
            self._collect_join_operands(op.left, out)
            self._collect_join_operands(op.right, out)
        else:
            out.append(op)

    def _greedy_join_order(self, operands: list[QueryOp], join_type: str) -> QueryOp:
        """Repeatedly join the pair with the minimum cardinality product
        (optimizer.rs:294-340); first-seen pair wins ties, as in the Rust
        scan order."""
        if not operands:
            raise ValueError("no operands for join")
        operands = list(operands)
        while len(operands) > 1:
            best = (float("inf"), 0, 1)
            for i in range(len(operands)):
                card_i = self.estimate_cost(operands[i]).cardinality
                for j in range(i + 1, len(operands)):
                    card_j = self.estimate_cost(operands[j]).cardinality
                    join_cost = float(card_i) * float(card_j)
                    if join_cost < best[0]:
                        best = (join_cost, i, j)
            _, i, j = best
            left = operands.pop(i)
            right = operands.pop(j - 1)  # j > i always, index shifts by one
            operands.append(Join(left, right, join_type))
        return operands[0]

    # -- explain rendering ------------------------------------------------

    def _explain(self, op: QueryOp, depth: int, lines: list[str]) -> None:
        indent = "  " * depth
        cost = self.estimate_cost(op)
        tag = f"[cost={cost.cost:.0f}, rows={cost.cardinality}]"
        if isinstance(op, EntityScan):
            lines.append(f"{indent}EntityScan({op.entity_type}) {tag}")
        elif isinstance(op, Filter):
            lines.append(f"{indent}Filter({op.property}={op.value}) {tag}")
            self._explain(op.source, depth + 1, lines)
        elif isinstance(op, Join):
            lines.append(f"{indent}Join({op.join_type}) {tag}")
            self._explain(op.left, depth + 1, lines)
            self._explain(op.right, depth + 1, lines)
        elif isinstance(op, Neighbors):
            rel = op.relation_type if op.relation_type is not None else "*"
            lines.append(f"{indent}Neighbors({rel}, hops={op.max_hops}) {tag}")
            self._explain(op.source, depth + 1, lines)
        elif isinstance(op, Union):
            lines.append(f"{indent}Union {tag}")
            self._explain(op.left, depth + 1, lines)
            self._explain(op.right, depth + 1, lines)
        elif isinstance(op, Limit):
            lines.append(f"{indent}Limit({op.count}) {tag}")
            self._explain(op.source, depth + 1, lines)
