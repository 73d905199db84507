"""Network flow.

Reference: crates/grafeo-adapters/src/plugins/algorithms/flow.rs
(max_flow :434, min_cost_flow :533). Augmenting-path flow algorithms are
inherently sequential (each augmentation depends on the previous residual
graph), so these run on a collected edge list behind a size guard — the
same operating envelope as the reference's in-memory engine. Documented
scale limit; use sampling/decomposition upstream for larger graphs.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

DRIVER_FLOW_MAX_EDGES = 500_000


def _residual(edges: DataFrame, cap_col: str, cost_col: str | None = None):
    """Residual-capacity dicts. Without costs, parallel capacities sum and
    anti-parallel edges share residuals (net-flow formulation — exact for
    the max-flow VALUE; :func:`_flow_assignment` then reports net flows).
    With costs, a (u, v)/(v, u) dict cannot hold two distinct priced arcs
    — a real reverse edge would overwrite the forward arc's residual cost
    with its negation — so every priced edge whose reverse (or a parallel
    duplicate) exists is split through a synthetic intermediate node:
    (u, m, cap, cost) + (m, v, cap, 0), flow-equivalent and collision-free."""
    ne = edges.count()  # distributed count BEFORE the collect it guards
    if ne > DRIVER_FLOW_MAX_EDGES:
        raise ValueError(f"flow guard: {ne} edges > {DRIVER_FLOW_MAX_EDGES}")
    rows = edges.collect()
    cap: dict[tuple[int, int], float] = {}
    cost: dict[tuple[int, int], float] = {}
    adj: dict[int, set[int]] = {}
    via: dict[int, tuple[int, int]] = {}  # synthetic node -> real (u, v)

    def add(u: int, v: int, c: float, w: float | None) -> None:
        cap[(u, v)] = cap.get((u, v), 0.0) + c
        cap.setdefault((v, u), 0.0)
        if w is not None:
            cost[(u, v)] = w
            cost[(v, u)] = -w
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    if cost_col is None:
        for r in rows:
            add(r.src, r.dst, float(r[cap_col]), None)
        return cap, cost, adj, via

    pairs = {(r.src, r.dst) for r in rows}
    from collections import Counter

    multi = Counter((r.src, r.dst) for r in rows)
    synth = max((x for p in pairs for x in p), default=0) + 1
    seen_first: set[tuple[int, int]] = set()
    for r in rows:
        u, v, c, w = r.src, r.dst, float(r[cap_col]), float(r[cost_col])
        clash = (v, u) in pairs or multi[(u, v)] > 1
        if clash and ((u, v) in seen_first or (v, u) in pairs):
            m = synth
            synth += 1
            via[m] = (u, v)
            add(u, m, c, w)
            add(m, v, c, 0.0)
        else:
            seen_first.add((u, v))
            add(u, v, c, w)
    return cap, cost, adj, via


def _flow_assignment(
    orig: dict[tuple[int, int], float], cap: dict[tuple[int, int], float]
) -> list[tuple[int, int, float]]:
    """Positive flow per original edge: initial capacity minus residual
    (anti-parallel edge pairs report net flow per direction)."""
    out = []
    for (u, v), c0 in sorted(orig.items()):
        if c0 <= 0.0:
            continue
        f = c0 - cap.get((u, v), 0.0)
        if f > 1e-12:
            out.append((u, v, f))
    return out


def max_flow(
    edges: DataFrame,
    source: int,
    sink: int,
    capacity_col: str = "capacity",
    with_edges: bool = False,
):
    """Edmonds-Karp BFS augmentation (flow.rs:434). Returns the flow
    value, or ``(value, [(src, dst, flow), ...])`` with
    ``with_edges=True`` (the solvOR bridge format, solvor.rs max_flow)."""
    cap, _, adj, _via = _residual(edges, capacity_col)
    orig = dict(cap)
    flow = 0.0
    while True:
        # BFS for an augmenting path in the residual graph
        parent: dict[int, int] = {source: source}
        q = deque([source])
        while q and sink not in parent:
            u = q.popleft()
            for v in sorted(adj.get(u, ())):
                if v not in parent and cap.get((u, v), 0.0) > 1e-12:
                    parent[v] = u
                    q.append(v)
        if sink not in parent:
            if with_edges:
                return flow, _flow_assignment(orig, cap)
            return flow
        # bottleneck
        aug = float("inf")
        v = sink
        while v != source:
            u = parent[v]
            aug = min(aug, cap[(u, v)])
            v = u
        v = sink
        while v != source:
            u = parent[v]
            cap[(u, v)] -= aug
            cap[(v, u)] += aug
            v = u
        flow += aug


def min_cost_flow(
    edges: DataFrame,
    source: int,
    sink: int,
    target_flow: float,
    capacity_col: str = "capacity",
    cost_col: str = "cost",
    with_edges: bool = False,
):
    """Successive shortest paths with Bellman-Ford (flow.rs:533).
    Returns (achieved_flow, total_cost), or with ``with_edges=True``
    (achieved_flow, total_cost, [(src, dst, flow, unit_cost), ...])."""
    cap, cost, adj, via = _residual(edges, capacity_col, cost_col)
    orig = dict(cap)
    flow = total_cost = 0.0
    nodes = sorted(adj)
    while flow < target_flow - 1e-12:
        dist = {v: float("inf") for v in nodes}
        parent: dict[int, int] = {}
        dist[source] = 0.0
        for _ in range(len(nodes) - 1):
            changed = False
            for (u, v), c in cap.items():
                if c > 1e-12 and dist[u] + cost.get((u, v), 0.0) < dist[v] - 1e-12:
                    dist[v] = dist[u] + cost.get((u, v), 0.0)
                    parent[v] = u
                    changed = True
            if not changed:
                break
        if dist[sink] == float("inf"):
            break
        aug = target_flow - flow
        v = sink
        while v != source:
            u = parent[v]
            aug = min(aug, cap[(u, v)])
            v = u
        v = sink
        while v != source:
            u = parent[v]
            cap[(u, v)] -= aug
            cap[(v, u)] += aug
            total_cost += aug * cost.get((u, v), 0.0)
            v = u
        flow += aug
    if with_edges:
        # translate synthetic split arcs back to their real edges: the
        # (u, m) arc carries the real cost; its (m, v) twin is dropped
        merged: dict[tuple[int, int, float], float] = {}
        for u, v, f in _flow_assignment(orig, cap):
            if v in via:
                ru, rv = via[v]
                merged[(ru, rv, cost.get((u, v), 0.0))] = (
                    merged.get((ru, rv, cost.get((u, v), 0.0)), 0.0) + f
                )
            elif u in via:
                continue
            else:
                merged[(u, v, cost.get((u, v), 0.0))] = (
                    merged.get((u, v, cost.get((u, v), 0.0)), 0.0) + f
                )
        assigned = sorted((u, v, f, w) for (u, v, w), f in merged.items())
        return flow, total_cost, assigned
    return flow, total_cost
