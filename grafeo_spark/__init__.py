"""grafeo_spark — a PySpark-native graph + analytics engine.

A from-scratch rebuild of the capabilities of GrafeoDB/grafeo (an embeddable
Rust graph database; see /root/reference) on top of Apache Spark:

- graph data as DataFrames (label-partitioned nodes, type-partitioned edges),
- a Cypher/GQL front-end compiled to a logical IR and then to the Spark
  DataFrame API (Catalyst is the optimizer, Tungsten/AQE the executor),
- graph algorithms as Pregel-style iterative DataFrame programs,
- vector similarity / dedup / text-analysis operators for large-scale
  data pipelines.

Architecture rationale lives in SURVEY.md at the repo root.
"""

from grafeo_spark.graph import PropertyGraph
from grafeo_spark.session import get_spark

__all__ = ["PropertyGraph", "get_spark"]
__version__ = "0.1.0"
