"""Deterministic corpus splitting — the train/val/test assignment stage
of a training-data pipeline.

A split must be a pure function of a stable id (never of row order,
partitioning, or a sampled RNG stream): re-running the pipeline, adding
columns, or re-partitioning at 100 TB must not move a document across
splits, and two engines must agree on the assignment. So the split is a
hash of ``id:seed`` — the first 8 hex chars of md5 as a uniform draw on
[0, 1) against the cumulative fractions. md5 (not xxhash64) so any other
engine — the DuckDB oracle included — reproduces assignments exactly;
both are uniform, and the hash is one map-side expression, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT = {"train": 0.9, "val": 0.05, "test": 0.05}


def split_bucket(id_col: Column, seed: str = "0") -> Column:
    """Uniform [0, 1) draw for an id: first 8 md5 hex chars of
    ``id:seed`` over 2^32. Changing ``seed`` re-deals every assignment;
    equal ids always draw the same value."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(":" + seed)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(
        4294967296.0
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: str = "0",
    split_col: str = "split",
) -> DataFrame:
    """Append ``split_col`` assigning each row to a named split with the
    given fractions (order-sensitive: cumulative boundaries follow the
    dict order; fractions must sum to ~1). Pure per-row Catalyst — at
    100 TB this runs map-side in whole-stage codegen and is stable under
    re-partitioning and re-runs."""
    fractions = dict(fractions or _DEFAULT)
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = split_bucket(F.col(id_col), seed)
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        expr = (
            F.when(u < cum, name) if expr is None else expr.when(u < cum, name)
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


__all__ = ["hash_split", "split_bucket"]
