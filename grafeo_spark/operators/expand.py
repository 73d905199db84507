"""Iterative path-expansion operators.

Replaces the reference's ``VariableLengthExpandOperator`` (BFS frontier
queue, crates/grafeo-core/src/execution/operators/variable_length_expand.rs:15,
BFS at :217-240) and ``ShortestPathOperator`` (shortest_path.rs:1-18) with
distributed self-join loops:

- each hop is one join of the frontier against the (pre-projected, 2-column)
  edge table — a shuffle on the join key; AQE handles skew;
- lineage is truncated with ``localCheckpoint`` every few hops so 10-hop
  expansions don't build 10-deep recursive plans;
- Cypher *trail* semantics (an edge may not repeat within one path) is kept
  by carrying the path's edge keys as an array column; use
  ``reachable_pairs`` when only distinct reachability matters — it is the
  100 TB-scale variant (per-hop dedup keeps the frontier bounded by
  |V|², not by path count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 3


def _edge_key() -> F.Column:
    return F.concat_ws(":", F.col("src").cast("string"), F.col("dst").cast("string"))


def var_length_expand(edges: DataFrame, min_hops: int, max_hops: int) -> DataFrame:
    """All trails of length in [min_hops, max_hops]: (src, dst, hops),
    one row per path (bag semantics, matching Cypher var-length MATCH).

    ``edges`` must have columns src, dst. Edge identity for the
    no-repeated-edge rule is the (src,dst) pair.
    """
    if min_hops < 0 or max_hops < min_hops:
        raise ValueError("need 0 <= min_hops <= max_hops")
    e = edges.select("src", "dst").withColumn("_ek", _edge_key())

    # frontier: (origin, cur, hops, _path: array of traversed edge keys)
    frontier = e.select(
        F.col("src").alias("origin"),
        F.col("dst").alias("cur"),
        F.lit(1).alias("hops"),
        F.array(F.col("_ek")).alias("_path"),
    )
    results = [frontier] if min_hops <= 1 else []
    hop = 1
    while hop < max_hops:
        hop += 1
        nxt = (
            frontier.join(e, frontier["cur"] == e["src"], "inner")
            .filter(~F.array_contains(F.col("_path"), F.col("_ek")))
            .select(
                F.col("origin"),
                e["dst"].alias("cur"),
                (F.col("hops") + 1).alias("hops"),
                F.array_append(F.col("_path"), F.col("_ek")).alias("_path"),
            )
        )
        if hop % _CHECKPOINT_EVERY == 0:
            nxt = nxt.localCheckpoint(eager=False)
        frontier = nxt
        if hop >= min_hops:
            results.append(frontier)

    if min_hops == 0:
        zero = (
            edges.select(F.col("src").alias("origin"))
            .unionAll(edges.select(F.col("dst").alias("origin")))
            .distinct()
            .select(
                "origin",
                F.col("origin").alias("cur"),
                F.lit(0).alias("hops"),
                F.array().cast("array<string>").alias("_path"),
            )
        )
        results.insert(0, zero)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        F.col("origin").alias("src"), F.col("cur").alias("dst"), F.col("hops")
    )


def reachable_pairs(edges: DataFrame, min_hops: int, max_hops: int) -> DataFrame:
    """Distinct (src, dst, hops=first reached) — BFS with per-level dedup.

    The scale path: frontier size is bounded by reachable pairs, not path
    count, so a dense 100 TB graph cannot blow up the intermediate state the
    way enumerating trails would.
    """
    e = edges.select("src", "dst").distinct()
    frontier = e.select(F.col("src").alias("origin"), F.col("dst").alias("cur")).distinct()
    seen = frontier.withColumn("hops", F.lit(1))
    results = [seen] if min_hops <= 1 else []
    hop = 1
    all_seen = frontier
    while hop < max_hops:
        hop += 1
        nxt = (
            frontier.join(e, frontier["cur"] == e["src"], "inner")
            .select(F.col("origin"), e["dst"].alias("cur"))
            .distinct()
            .join(all_seen, ["origin", "cur"], "left_anti")
        )
        if hop % _CHECKPOINT_EVERY == 0:
            nxt = nxt.localCheckpoint(eager=False)
        frontier = nxt
        all_seen = all_seen.unionByName(frontier).distinct()
        if hop >= min_hops:
            results.append(frontier.withColumn("hops", F.lit(hop)))

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(F.col("origin").alias("src"), F.col("cur").alias("dst"), "hops")


def shortest_path_lengths(edges: DataFrame, max_hops: int) -> DataFrame:
    """(src, dst, hops) with hops = BFS shortest-path length (1..max_hops).

    Mirrors ShortestPathOperator's BFS (shortest_path.rs:65). Because levels
    are explored in order and previously-seen pairs are anti-joined away,
    the first time a pair appears IS its shortest distance.
    """
    return reachable_pairs(edges, 1, max_hops)
