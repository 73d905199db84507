"""Product quantization (PQ) for embedding columns.

The reference ships scalar (4x), binary (32x) and product (8-32x)
quantization variants (crates/grafeo-core/src/index/vector/quantization.rs:1-9).
Scalar and binary are pure Catalyst expressions (functions/vector.py); this
module adds the product variant, Spark-shaped:

- **training** is a sampled driver-side k-means per subspace (standard at
  any scale: codebooks are tiny — m × k × sub_dim floats — and training on
  a bounded sample is how FAISS/ScaNN build them too); the codebooks are
  then broadcast to executors;
- **encoding** is a vectorized Arrow-batched pandas iterator
  (``mapInPandas``) — an argmin over k centroids per subspace is matrix
  math, the one place Python earns its keep;
- **search** is pure Catalyst again: the query's per-subspace distance
  table is computed once on the driver and folded in as literal arrays, so
  the asymmetric-distance scan (``sum_m LUT[m][code_m]``) runs inside
  whole-stage codegen over the (tiny) code column — at 100 TB the scan
  reads m bytes per vector instead of 4·dim.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample: int = 10_000,
    iters: int = 12,
    seed: int = 42,
):
    """k-means codebooks as an (m, k, dim/m) numpy array, trained on a
    bounded sample (deterministic: seeded init, fixed iterations)."""
    import numpy as np

    n = df.count()
    frac = min(1.0, (sample * 1.2) / max(n, 1))
    rows = (
        df.select(vec_col).sample(False, frac, seed=seed).limit(sample).collect()
        if frac < 1.0
        else df.select(vec_col).limit(sample).collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[rng.choice(len(xs), size=min(k, len(xs)), replace=False)]
        if len(cent) < k:  # degenerate tiny sample: pad by repetition
            cent = np.resize(cent, (k, sub))
        for _ in range(iters):
            d = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Append ``code_col: array<int>`` (length m) — each subvector's nearest
    centroid index, computed as one numpy argmin per Arrow batch."""
    import numpy as np

    books = np.asarray(codebooks)
    m, k, sub = books.shape
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {code_col} array<int>"
    cols = [f.name for f in df.schema.fields]

    def encode(batches):
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
                d = -2.0 * xs @ books[j].T + (books[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = d.argmin(axis=1)
            pdf = pdf.copy()
            pdf[code_col] = [list(map(int, row)) for row in codes]
            yield pdf

    return df.select(*cols).mapInPandas(encode, schema)


def pq_decode(codebooks, code_col="pq_code"):
    """Column expression reconstructing the (approximate) vector from its
    PQ code — concatenation of the selected centroids, as literals."""
    import numpy as np

    books = np.asarray(codebooks)
    m, k, sub = books.shape
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    parts = []
    for j in range(m):
        table = F.array(
            *[
                F.array(*[F.lit(float(v)) for v in books[j, ci]])
                for ci in range(k)
            ]
        )
        parts.append(F.element_at(table, c[j] + 1))
    return F.flatten(F.array(*parts))


def pq_distances(
    codes_df: DataFrame,
    query_vec: Sequence[float],
    codebooks,
    code_col: str = "pq_code",
    dist_col: str = "pq_dist",
) -> DataFrame:
    """Append the asymmetric squared-L2 distance query↔code: the per-
    subspace lookup table is computed once on the driver and folded in as
    literal arrays, so the scan is pure whole-stage-codegen arithmetic
    over the m-byte codes (quantization.rs asymmetric distance)."""
    import numpy as np

    books = np.asarray(codebooks)
    m, k, sub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    c = F.col(code_col)
    total = F.lit(0.0)
    for j in range(m):
        qs = q[j * sub : (j + 1) * sub]
        lut = ((books[j] - qs[None, :]) ** 2).sum(axis=1)  # (k,)
        table = F.array(*[F.lit(float(v)) for v in lut])
        total = total + F.element_at(table, c[j] + 1)
    return codes_df.withColumn(dist_col, total)


def pq_topk(
    codes_df: DataFrame,
    query_vec: Sequence[float],
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_dist) top-k by asymmetric PQ distance — the compressed-scan
    ANN baseline; rerank the survivors against the raw vectors when exact
    order matters."""
    scored = pq_distances(codes_df, query_vec, codebooks, code_col)
    return (
        scored.select(F.col(id_col).alias("id"), F.col("pq_dist"))
        .orderBy(F.col("pq_dist").asc(), F.col("id").asc())
        .limit(k)
    )
