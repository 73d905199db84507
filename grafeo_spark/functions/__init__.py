from grafeo_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    manhattan_distance,
    l2_normalize,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "manhattan_distance",
    "l2_normalize",
]
