"""Vector distance functions as native Column expressions.

The reference exposes cosine_similarity / euclidean_distance / dot_product /
manhattan_distance as GQL scalar functions backed by SIMD kernels
(crates/grafeo-core/src/execution/operators/filter.rs:995-1055,
index/vector/distance.rs). Here each is a pure Catalyst expression tree
(zip_with + aggregate) that runs inside whole-stage codegen — no Python
boundary, so a 100 TB scan pays zero serialization cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a, b) -> Column:
    a, b = _to_col(a), _to_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> Column:
    a = _to_col(a)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a, b) -> Column:
    return dot_product(a, b) / (_norm(a) * _norm(b))


def euclidean_distance(a, b) -> Column:
    a, b = _to_col(a), _to_col(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def manhattan_distance(a, b) -> Column:
    a, b = _to_col(a), _to_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_normalize(a) -> Column:
    a = _to_col(a)
    n = _norm(a)
    return F.transform(a, lambda x: x / n)
