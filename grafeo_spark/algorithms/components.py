"""Connected components, SCC, topological sort.

Reference: crates/grafeo-adapters/src/plugins/algorithms/components.rs
(UnionFind :23, connected_components :361, scc :389, topological_sort :417).
The union-find becomes min-label propagation (hash-to-min) on the Pregel
kernel; SCC uses the forward-max-coloring + backward-reachability scheme;
toposort is iterative in-degree peeling (Kahn) — all pure DataFrame loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_spark.algorithms.pregel import pregel, undirect, vertices_from_edges


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """(id, component) — weakly connected; component = min reachable id.

    Min-label propagation converges in O(diameter) supersteps, each two
    shuffles; the classic scale algorithm (GraphX ConnectedComponents
    semantics, replacing components.rs:361's union-find).
    """
    v = vertices_from_edges(edges).withColumn("comp", F.col("id"))

    def update(j: DataFrame) -> DataFrame:
        better = F.col("_msg").isNotNull() & (F.col("_msg") < F.col("comp"))
        return j.select(
            "id",
            F.when(better, F.col("_msg")).otherwise(F.col("comp")).alias("comp"),
            better.alias("_changed"),
        )

    out = pregel(
        v,
        edges.select("src", "dst"),
        send_to_dst=F.col("v_comp"),
        send_to_src=F.col("v_comp"),
        agg_msg=F.min("msg"),
        update=update,
        max_iter=max_iter,
    )
    return out.select("id", F.col("comp").alias("component"))


def strongly_connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """(id, component) with component = min id of the SCC (components.rs:389).

    Coloring algorithm: propagate the minimum id forward through unassigned
    vertices; vertices whose color equals their own id are roots; everything
    backward-reachable from a root *within the same color* is one SCC.
    Peels at least one SCC per outer round.
    """
    from grafeo_spark.operators.expand import reachable_pairs

    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    remaining = vertices_from_edges(e).localCheckpoint(eager=True)
    spark = e.sparkSession
    assigned = spark.createDataFrame([], "id long, component long")

    for _ in range(max_iter):
        if remaining.isEmpty():
            break
        # forward min-id coloring over the remaining subgraph
        colors = connected_min_color_forward(e, remaining)
        # roots: color == own id; backward reachability along reversed edges
        # restricted to same-color vertices = the SCC of the root
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        roots = colors.filter(F.col("color") == F.col("id")).select("id")
        back = reachable_pairs(
            _same_color_edges(rev, colors), 1, max_iter, src_ids=roots, early_exit=True
        ).select(F.col("src").alias("root"), F.col("dst").alias("id"))
        scc = (
            roots.select(F.col("id").alias("root"), F.col("id"))
            .unionByName(back)
            .distinct()
            .select("id", F.col("root").alias("component"))
        )
        assigned = assigned.unionByName(scc).localCheckpoint(eager=True)
        remaining = remaining.join(assigned.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        e = (
            e.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    return assigned


def _same_color_edges(edges: DataFrame, colors: DataFrame) -> DataFrame:
    cs = colors.select(F.col("id").alias("src"), F.col("color").alias("_sc"))
    cd = colors.select(F.col("id").alias("dst"), F.col("color").alias("_dc"))
    return (
        edges.join(cs, "src")
        .join(cd, "dst")
        .filter(F.col("_sc") == F.col("_dc"))
        .select("src", "dst")
    )


def connected_min_color_forward(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Propagate min id along edge direction within the given vertex set."""
    sub = (
        edges.join(vertices.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(vertices.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    v = vertices.withColumn("color", F.col("id"))

    def update(j: DataFrame) -> DataFrame:
        better = F.col("_msg").isNotNull() & (F.col("_msg") < F.col("color"))
        return j.select(
            "id",
            F.when(better, F.col("_msg")).otherwise(F.col("color")).alias("color"),
            better.alias("_changed"),
        )

    return pregel(
        v,
        sub,
        send_to_dst=F.col("v_color"),
        agg_msg=F.min("msg"),
        update=update,
        max_iter=max_iter,
    )


def topological_sort(edges: DataFrame, max_iter: int = 200) -> DataFrame:
    """(id, level) — Kahn's in-degree peeling (components.rs:417).

    level = longest-path depth from any source; order within a level is by
    id. Raises on cycles (matching the reference's error behavior).
    """
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    remaining = vertices_from_edges(e)
    spark = e.sparkSession
    out = spark.createDataFrame([], "id long, level long")
    level = 0
    while not remaining.isEmpty():
        if level >= max_iter:
            raise ValueError("topological_sort: max_iter exceeded")
        has_in = e.select(F.col("dst").alias("id")).distinct()
        sources = remaining.join(has_in, "id", "left_anti")
        if sources.isEmpty():
            raise ValueError("topological_sort: graph has a cycle")
        out = out.unionByName(sources.withColumn("level", F.lit(level).cast("long")))
        remaining = remaining.join(sources, "id", "left_anti").localCheckpoint(eager=True)
        e = e.join(sources.withColumnRenamed("id", "src"), "src", "left_anti").localCheckpoint(
            eager=True
        )
        level += 1
    return out
