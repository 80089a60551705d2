"""Leiden community detection (graphrag-rs graph/leiden.rs:469-540).

The reference runs ONE level despite its hierarchical API: (1) every node
its own community, (2) sequential greedy local moving with Newman's
modularity delta (leiden.rs:706-731: ``Δ = (k_in_to − k_in_from)/2m −
resolution · k_i · (Σtot_to − Σtot_from + k_i)/(2m)²`` on the unweighted
degree), (3) the Leiden refinement: any community that is not a connected
subgraph is split into its connected components (leiden.rs:595-668).
Config semantics honored: ``resolution`` scales the degree penalty; the
``seed`` is accepted for API parity but — exactly as in the reference,
where ``_rng`` is initialized and never used (leiden.rs:480-484) — the
algorithm is deterministic and the seed changes nothing.

Two execution paths, same output contract (id, community_id,
community_size; community_id = min member node id):

* **local** (edge count ≤ ``local_threshold``): the reference algorithm
  ported exactly — sequential moves over nodes in sorted-id order (the
  deterministic stand-in for petgraph insertion order; the reference's
  HashMap iteration makes its own order unstable).
* **distributed**: synchronous parallel local moving — each round computes
  every node's best positive-delta move against the CURRENT partition with
  DataFrame joins (k_in per neighboring community, Σtot per community) and
  applies all moves at once; ties break on min community label. Rounds are
  O(2 shuffles) each. Refinement reuses the distributed
  large-star/small-star CC on intra-community edges. Synchronous moving
  explores the same objective but can step differently than the sequential
  reference — at scale the refinement guarantee (connected communities)
  and the modularity objective are the contract, not move-order parity.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphrag_rs_spark.operators.graph import connected_components


def _leiden_local(
    edge_list: list[tuple[str, str]],
    resolution: float,
    max_iterations: int,
) -> dict[str, str]:
    """Exact sequential port; returns node -> community_id (min member)."""
    adj: dict[str, set[str]] = defaultdict(set)
    for u, v in edge_list:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    nodes = sorted(adj)
    degree = {n: len(adj[n]) for n in nodes}
    two_m = float(sum(degree.values()))  # 2·|E| (undirected)
    if two_m == 0:
        return {n: n for n in nodes}

    comm = {n: i for i, n in enumerate(nodes)}
    sigma_tot = defaultdict(float)
    for n in nodes:
        sigma_tot[comm[n]] += degree[n]

    improved, iteration = True, 0
    while improved and iteration < max_iterations:
        improved = False
        for n in nodes:
            cur = comm[n]
            k_i = float(degree[n])
            # edges from n into each neighboring community
            k_in: dict[int, int] = defaultdict(int)
            for nb in adj[n]:
                k_in[comm[nb]] += 1
            best, best_delta = cur, 0.0
            for cand in sorted(k_in):  # deterministic candidate order
                if cand == cur:
                    continue
                delta = (
                    (k_in[cand] - k_in.get(cur, 0)) / two_m
                    - resolution * k_i
                    * (sigma_tot[cand] - sigma_tot[cur] + k_i)
                    / (two_m * two_m)
                )
                if delta > best_delta:
                    best, best_delta = cand, delta
            if best != cur:
                sigma_tot[cur] -= k_i
                sigma_tot[best] += k_i
                comm[n] = best
                improved = True
        iteration += 1

    # refinement: split communities that are not connected subgraphs
    members: dict[int, list[str]] = defaultdict(list)
    for n in nodes:
        members[comm[n]].append(n)
    out: dict[str, str] = {}
    for mem in members.values():
        mem_set = set(mem)
        unvisited = set(mem)
        while unvisited:
            seed_node = min(unvisited)
            stack, component = [seed_node], []
            unvisited.remove(seed_node)
            while stack:
                cur = stack.pop()
                component.append(cur)
                for nb in adj[cur]:
                    if nb in mem_set and nb in unvisited:
                        unvisited.remove(nb)
                        stack.append(nb)
            cid = min(component)
            for n in component:
                out[n] = cid
    return out


def leiden_communities(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    resolution: float = 1.0,
    max_iterations: int = 100,
    max_rounds_distributed: int = 20,
    local_threshold: int = 100_000,
    seed: int | None = None,  # noqa: ARG001 — parity: reference never uses it
) -> DataFrame:
    """Edge list → (id, community_id, community_size)."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    if n_edges == 0:
        return spark.createDataFrame(
            [], "id string, community_id string, community_size long"
        )

    if n_edges <= local_threshold:
        assign = _leiden_local(
            [(r["u"], r["v"]) for r in e.collect()], resolution, max_iterations
        )
        sizes: dict[str, int] = defaultdict(int)
        for c in assign.values():
            sizes[c] += 1
        return spark.createDataFrame(
            [(n, c, sizes[c]) for n, c in sorted(assign.items())],
            "id string, community_id string, community_size long",
        )

    return _leiden_distributed(e, resolution, max_rounds_distributed)


def _leiden_distributed(
    e: DataFrame, resolution: float, max_rounds: int
) -> DataFrame:
    """Synchronous parallel local moving + CC refinement (see module doc)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).localCheckpoint(
        eager=True
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("k")).localCheckpoint(eager=True)
    two_m = float(sym.count())

    labels = deg.select(F.col("u").alias("id"), F.col("u").alias("c"), "k")
    labels = labels.localCheckpoint(eager=True)

    zero_rounds = 0
    for round_no in range(max_rounds):
        lbl = labels.select("id", "c")
        sigma = labels.groupBy("c").agg(F.sum("k").alias("sigma_tot"))
        # k_in: edges from each node into each neighboring community
        nbr_comms = (
            sym.join(lbl.select(F.col("id").alias("v"), F.col("c").alias("nc")), "v")
            .groupBy("u", "nc")
            .agg(F.count(F.lit(1)).alias("k_in"))
        )
        cur = labels.select(
            F.col("id").alias("u"), F.col("c").alias("cur_c"), "k"
        )
        cand = (
            nbr_comms.join(cur, "u")
            .join(
                sigma.select(F.col("c").alias("nc"), F.col("sigma_tot").alias("s_to")),
                "nc",
            )
            .join(
                sigma.select(F.col("c").alias("cur_c"), F.col("sigma_tot").alias("s_from")),
                "cur_c",
            )
        )
        k_in_cur = (
            nbr_comms.select(
                "u", F.col("nc").alias("cur_c"), F.col("k_in").alias("k_in_cur")
            )
        )
        cand = cand.join(k_in_cur, ["u", "cur_c"], "left").na.fill({"k_in_cur": 0})
        delta = (
            (F.col("k_in") - F.col("k_in_cur")) / F.lit(two_m)
            - F.lit(resolution) * F.col("k")
            * (F.col("s_to") - F.col("s_from") + F.col("k"))
            / F.lit(two_m * two_m)
        )
        moves = cand.where(F.col("nc") != F.col("cur_c")).select(
            "u", "nc", delta.alias("d")
        ).where(F.col("d") > 0)
        from pyspark.sql import Window

        w = Window.partitionBy("u").orderBy(F.desc("d"), F.asc("nc"))
        best = (
            moves.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            # parity gate: only half the nodes (by id hash) may move each
            # round — synchronous updates would otherwise let symmetric
            # neighbors swap communities forever (the classic oscillation)
            .where(
                F.pmod(F.xxhash64("u"), F.lit(2)) == F.lit(round_no % 2)
            )
            .select(F.col("u").alias("id"), F.col("nc").alias("new_c"))
        )
        new_labels = (
            labels.join(best, "id", "left")
            .select(
                "id", F.coalesce("new_c", F.col("c")).alias("c"), "k"
            )
            .localCheckpoint(eager=True)
        )
        n_moves = best.count()
        labels = new_labels
        # converged only after BOTH parities had a zero-move round
        zero_rounds = zero_rounds + 1 if n_moves == 0 else 0
        if zero_rounds >= 2:
            break

    # refinement: split disconnected communities via CC over intra-community
    # edges; community id canonicalizes to min member id
    lbl = labels.select("id", "c")
    intra = (
        e.join(lbl.select(F.col("id").alias("u"), F.col("c").alias("cu")), "u")
        .join(lbl.select(F.col("id").alias("v"), F.col("c").alias("cv")), "v")
        .where(F.col("cu") == F.col("cv"))
        .select("u", "v")
    )
    cc = connected_components(intra, src="u", dst="v")
    refined = lbl.join(cc, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("community_id")
    )
    sizes = refined.groupBy("community_id").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return refined.join(sizes, "community_id").select(
        "id", "community_id", "community_size"
    )
