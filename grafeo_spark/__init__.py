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

from grafeo_spark.graph import PropertyGraph, TripleStore
from grafeo_spark.session import get_spark


def __getattr__(name):
    # lazy convenience re-exports (avoid importing heavy optional deps at
    # package import time)
    if name == "GrafeoSpark":
        from grafeo_spark.engine import GrafeoSpark

        return GrafeoSpark
    if name in ("save_graph", "load_graph", "save_triples", "load_triples"):
        import grafeo_spark.sources as _s

        return getattr(_s, name)
    if name in ("to_networkx", "from_networkx"):
        import grafeo_spark.bridges as _b

        return getattr(_b, name)
    raise AttributeError(name)


__all__ = [
    "PropertyGraph", "TripleStore", "get_spark", "GrafeoSpark",
    "save_graph", "load_graph", "save_triples", "load_triples",
    "to_networkx", "from_networkx",
]
__version__ = "0.1.0"
