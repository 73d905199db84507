from grafeo_spark.functions.vector import (
    binary_hamming,
    binary_quantize,
    cosine_similarity,
    dot_product,
    euclidean_distance,
    manhattan_distance,
    l2_normalize,
    quantization_error,
    scalar_dequantize,
    scalar_quantize,
)

__all__ = [
    "binary_hamming",
    "binary_quantize",
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "manhattan_distance",
    "l2_normalize",
    "scalar_quantize",
    "scalar_dequantize",
    "quantization_error",
]
