"""Centrality algorithms.

Reference: crates/grafeo-adapters/src/plugins/algorithms/centrality.rs
(PageRank :442, degree :489, closeness :535, betweenness :580). PageRank /
degree / closeness are fully distributed DataFrame programs; betweenness is
Brandes' algorithm, which is inherently per-source sequential accumulation —
it runs on a collected edge list behind a size guard (the reference engine
is single-node in-memory, so this matches its operating envelope; at 100 TB
you'd sample sources, which ``sample_sources`` supports).
"""

from __future__ import annotations

from collections import deque
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_spark.algorithms.pregel import undirect, vertices_from_edges

DRIVER_ALGO_MAX_NODES = 100_000


def degree_centrality(edges: DataFrame, direction: str = "both") -> DataFrame:
    """(id, degree) — one partial-aggregated shuffle (centrality.rs:489)."""
    if direction == "out":
        key = edges.select(F.col("src").alias("id"))
    elif direction == "in":
        key = edges.select(F.col("dst").alias("id"))
    else:
        key = edges.select(F.col("src").alias("id")).unionAll(
            edges.select(F.col("dst").alias("id"))
        )
    return key.groupBy("id").agg(F.count("*").alias("degree"))


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 20,
    vertices: Optional[DataFrame] = None,
    tol: Optional[float] = None,
) -> DataFrame:
    """Normalized PageRank with dangling-mass redistribution
    (centrality.rs:442 semantics; matches the textbook/NetworkX definition).

    Per iteration: one shuffle for the contribution sum plus one tiny
    scalar job for the dangling mass, read from the checkpointed state
    (cached partitions — a driver round-trip, but measurably cheaper than
    folding the scalar in as a broadcast-exchange branch, which adds a
    blocking broadcast job whose lineage re-plans the whole superstep).
    State (id, pr, outdeg) is checkpointed every superstep so each
    superstep executes exactly once.

    ``tol``: convergence early-exit — stop once ``max |Δpr| < tol``
    (one extra scalar aggregate per superstep, read from the
    already-checkpointed state). Default None runs exactly ``max_iter``
    supersteps, matching fixed-iteration oracles (NetworkX's
    ``tol`` semantics differ: it sums per-node error — use
    ``tol=n*nx_tol`` for parity).
    """
    if vertices is not None:
        outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        state = (
            vertices.select("id")
            .join(outdeg.withColumnRenamed("src", "id"), "id", "left")
            .fillna({"outdeg": 0})
        )
    else:
        # vertex set + out-degree in ONE shuffle: every edge contributes
        # (src, 1) and (dst, 0), so the grouped sum is the out-degree and
        # the key set is exactly the endpoint union
        state = (
            edges.select(
                F.explode(
                    F.array(
                        F.struct(F.col("src").alias("id"), F.lit(1).alias("d")),
                        F.struct(F.col("dst").alias("id"), F.lit(0).alias("d")),
                    )
                ).alias("x")
            )
            .select("x.id", "x.d")
            .groupBy("id")
            .agg(F.sum("d").alias("outdeg"))
        )
    state = state.localCheckpoint(eager=True)
    n = state.count()
    if n == 0:
        return state.select("id", F.lit(0.0).alias("pagerank"))
    state = state.withColumn("pr", F.lit(1.0 / n)).localCheckpoint(eager=True)
    # materialize the edge list once, hash-partitioned by the join key:
    # every iteration's contribution join then co-locates against the cached
    # partitioning and only the (much smaller) vertex state moves
    e = (
        edges.select(F.col("src").alias("_es"), F.col("dst").alias("_ed"))
        .repartition("_es")
        .persist()
    )
    it = 0
    for it in range(1, max_iter + 1):
        dang = (
            state.filter(F.col("outdeg") == 0)
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
            .first()[0]
        )
        contrib = (
            e.join(state, e["_es"] == state["id"], "inner")
            .select(F.col("_ed").alias("id"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        # keep the previous rank only when convergence is checked — the
        # tol=None path would otherwise checkpoint a dead column per superstep
        prev = state.withColumnRenamed("pr", "_prev") if tol is not None else state.drop("pr")
        state = (
            prev.join(contrib, "id", "left")
            .withColumn(
                "pr",
                F.lit((1.0 - alpha) / n + alpha * dang / n)
                + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0)),
            )
            .drop("contrib")
        )
        state = state.localCheckpoint(eager=True)
        if n > 2_000_000:
            # big-state runs only: free the previous superstep's
            # checkpoint blocks eagerly — see pregel.py: unreferenced
            # checkpoints otherwise pile up in the block store until a
            # chance GC (measured at sf25 / 46M vertices: supersteps
            # churned 29-60s vs a flat ~17s with explicit collection).
            # Gated on n so small-graph runs don't pay ~0.1s/superstep
            # of driver GC for blocks that total a few MB.
            import gc

            gc.collect()
        if tol is not None:
            delta = state.agg(F.max(F.abs(F.col("pr") - F.col("_prev")))).first()[0]
            state = state.drop("_prev")
            if delta is not None and delta < tol:
                break
    e.unpersist()
    out = state.select("id", F.col("pr").alias("pagerank"))
    # diagnostic for tests/tuning: how many supersteps actually ran
    out.iterations_run = it  # type: ignore[attr-defined]
    return out


def closeness_centrality(
    edges: DataFrame, max_hops: int = 20, wf_improved: bool = True
) -> DataFrame:
    """Closeness over unweighted shortest paths (centrality.rs:535).

    Uses the level-synchronous all-sources BFS (`reachable_pairs`) — the
    state is bounded by reachable (src,dst) pairs; for very large graphs
    restrict to a sampled vertex subset upstream.
    """
    from grafeo_spark.operators.expand import reachable_pairs

    und = undirect(edges.select("src", "dst"))
    n = vertices_from_edges(edges).count()
    # drop src==dst pairs: an undirected walk returns to its origin in two
    # hops, but distance-to-self is 0 by definition
    pairs = reachable_pairs(und, 1, max_hops, early_exit=True).filter(
        F.col("src") != F.col("dst")
    )
    agg = pairs.groupBy("src").agg(
        F.count("*").alias("r"), F.sum("hops").alias("total")
    )
    # closeness = (r) / total; Wasserman-Faust scales by r/(n-1)
    c = F.col("r") / F.col("total")
    if wf_improved:
        c = c * (F.col("r") / F.lit(max(n - 1, 1)))
    return agg.select(F.col("src").alias("id"), c.alias("closeness"))


def betweenness_centrality(
    edges: DataFrame,
    normalized: bool = True,
    directed: bool = False,
    max_nodes: int = DRIVER_ALGO_MAX_NODES,
) -> DataFrame:
    """Brandes' betweenness (centrality.rs:580) on the collected edge list.

    Driver-side with an explicit size guard: Brandes accumulates per-source
    dependency values in reverse-BFS order — inherently sequential per
    source. The reference runs fully in-memory too; for cluster-scale use,
    sample sources and scale up.
    """
    e = edges.select("src", "dst").distinct()
    spark = e.sparkSession
    nv = vertices_from_edges(e).count()
    if nv > max_nodes:
        raise ValueError(
            f"betweenness_centrality guard: {nv} nodes > {max_nodes}; "
            "sample the graph or raise max_nodes explicitly"
        )
    adj: dict[int, list[int]] = {}
    for s, d in e.collect():
        adj.setdefault(s, []).append(d)
        if not directed:
            adj.setdefault(d, []).append(s)
        else:
            adj.setdefault(d, adj.get(d, []))
    nodes = sorted(adj)
    bc = {v: 0.0 for v in nodes}
    for s in nodes:
        # single-source shortest-path counts
        stack: list[int] = []
        pred: dict[int, list[int]] = {v: [] for v in nodes}
        sigma = {v: 0.0 for v in nodes}
        dist = {v: -1 for v in nodes}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj.get(v, ()):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in nodes}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    if not directed:
        bc = {v: x / 2.0 for v, x in bc.items()}
    if normalized and nv > 2:
        scale = 1.0 / ((nv - 1) * (nv - 2)) if directed else 2.0 / ((nv - 1) * (nv - 2))
        bc = {v: x * scale for v, x in bc.items()}
    return spark.createDataFrame(
        [(v, x) for v, x in bc.items()], "id long, betweenness double"
    )
