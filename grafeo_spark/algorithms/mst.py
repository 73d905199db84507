"""Minimum spanning tree / forest.

Reference: crates/grafeo-adapters/src/plugins/algorithms/mst.rs
(Kruskal :288, Prim :353). Both are sequential union-find/heap algorithms;
the distributed equivalent is Borůvka: every component picks its minimum
outgoing edge each round, components merge, O(log V) rounds — each round a
couple of shuffles. Deterministic tie-break by (weight, src, dst) keeps the
result cycle-free and reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_spark.algorithms.components import connected_components
from grafeo_spark.algorithms.pregel import vertices_from_edges


def minimum_spanning_forest(
    edges: DataFrame, weight_col: str = "weight", max_iter: int = 30
) -> DataFrame:
    """(src, dst, weight) edges of the minimum spanning forest (Borůvka)."""
    e = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .localCheckpoint(eager=True)
    )
    spark = e.sparkSession
    comp = vertices_from_edges(e).withColumn("component", F.col("id"))
    mst = spark.createDataFrame([], "src long, dst long, weight double")

    for _ in range(max_iter):
        cs = comp.select(F.col("id").alias("src"), F.col("component").alias("_cs"))
        cd = comp.select(F.col("id").alias("dst"), F.col("component").alias("_cd"))
        cross = (
            e.join(cs, "src").join(cd, "dst").filter(F.col("_cs") != F.col("_cd"))
        )
        if cross.isEmpty():
            break
        pick = F.struct("weight", "src", "dst").alias("pick")
        cand = cross.select(F.col("_cs").alias("c"), pick).unionAll(
            cross.select(F.col("_cd").alias("c"), pick)
        )
        best = (
            cand.groupBy("c")
            .agg(F.min("pick").alias("p"))
            .select(
                F.col("p.src").alias("src"),
                F.col("p.dst").alias("dst"),
                F.col("p.weight").alias("weight"),
            )
            .distinct()
        )
        mst = mst.unionByName(best).distinct().localCheckpoint(eager=True)
        cc = connected_components(mst.select("src", "dst"))
        comp = (
            comp.select("id")
            .join(cc, "id", "left")
            .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
            .localCheckpoint(eager=True)
        )
    return mst


def minimum_spanning_tree(edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    """Alias (mst.rs Kruskal/Prim parity surface)."""
    return minimum_spanning_forest(edges, weight_col)
