"""Triangle counting and clustering coefficients.

Reference: crates/grafeo-adapters/src/plugins/algorithms/clustering.rs:400.
The reference uses its leapfrog trie join for triangles; the Spark plan is
the standard two-join enumeration over canonical (src < dst) edges — each
triangle (a<b<c) is produced exactly once, and AQE/broadcast handles the
smaller side. Per-vertex counts distribute each triangle to its three
corners (one extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_spark.algorithms.pregel import canonical_undirected, vertices_from_edges


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles as (a, b, c) with a < b < c, each exactly once."""
    e = canonical_undirected(edges)
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("_b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("_a"), F.col("dst").alias("_c"))
    return (
        ab.join(bc, F.col("b") == F.col("_b"), "inner")
        .join(ac, (F.col("a") == F.col("_a")) & (F.col("c") == F.col("_c")), "left_semi")
        .select("a", "b", "c")
    )


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count (clustering.rs:400)."""
    return triangles(edges).count()


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles) — every vertex of the edge set, 0 when none."""
    t = triangles(edges)
    corners = (
        t.select(F.col("a").alias("id"))
        .unionAll(t.select(F.col("b").alias("id")))
        .unionAll(t.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        vertices_from_edges(edges)
        .join(counts, "id", "left")
        .fillna({"triangles": 0})
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, coefficient) — local clustering coefficient
    2*T(v) / (deg(v)*(deg(v)-1)) over the undirected simple graph."""
    e = canonical_undirected(edges)
    deg = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    t = triangle_count_per_vertex(edges)
    return t.join(deg, "id", "inner").select(
        "id",
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("coefficient"),
    )


def average_clustering(edges: DataFrame) -> float:
    r = clustering_coefficient(edges).agg(F.avg("coefficient")).collect()[0][0]
    return float(r or 0.0)
