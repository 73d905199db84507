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


def _sampled_matrix(df: DataFrame, vec_col: str, sample: int, seed: int):
    import numpy as np

    n = df.count()
    frac = min(1.0, (sample * 1.2) / max(n, 1))
    rows = (
        df.select(vec_col).sample(False, frac, seed=seed).limit(sample).collect()
        if frac < 1.0
        else df.select(vec_col).limit(sample).collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def _kmeans(xs, k: int, iters: int, rng):
    """Seeded fixed-iteration Lloyd's over a driver sample — returns (k,
    dim) centroids (empty clusters keep their previous centroid)."""
    import numpy as np

    cent = xs[rng.choice(len(xs), size=min(k, len(xs)), replace=False)]
    if len(cent) < k:  # degenerate tiny sample: pad by repetition
        cent = np.resize(cent, (k, xs.shape[1]))
    cent = cent.copy()
    for _ in range(iters):
        d = -2.0 * xs @ cent.T + (cent**2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = xs[mask].mean(axis=0)
    return cent


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

    x = _sampled_matrix(df, vec_col, sample, seed)
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        books[j] = _kmeans(x[:, j * sub : (j + 1) * sub], k, iters, rng)
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


# --------------------------------------------------------------------- #
# IVF (inverted-file) ANN — the coarse-cluster counterpart to SRP-LSH
# --------------------------------------------------------------------- #


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 64,
    sample: int = 10_000,
    iters: int = 12,
    seed: int = 42,
):
    """Coarse k-means centroids as an (nlist, dim) numpy array — the IVF
    partitioner. Train once, broadcast, and write the assigned cell as a
    partition column so a probe reads only its cells' files at scale."""
    import numpy as np

    x = _sampled_matrix(df, vec_col, sample, seed)
    return _kmeans(x, nlist, iters, np.random.default_rng(seed))


def ivf_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Append ``cell_col: int`` — each vector's nearest coarse centroid
    (one numpy argmin per Arrow batch)."""
    import numpy as np

    cent = np.asarray(centroids)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {cell_col} int"
    cols = [f.name for f in df.schema.fields]

    def assign(batches):
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d = -2.0 * x @ cent.T + (cent**2).sum(axis=1)[None, :]
            pdf = pdf.copy()
            pdf[cell_col] = d.argmin(axis=1).astype("int32")
            yield pdf

    return df.select(*cols).mapInPandas(assign, schema)


def ivf_topk(
    cells_df: DataFrame,
    query_vec: Sequence[float],
    centroids,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    metric: str = "cosine",
) -> DataFrame:
    """Approximate top-k: rank cells by centroid closeness to the query on
    the driver — UNDER THE REQUESTED METRIC (for cosine the centroids and
    query are normalized first; ranking cells by raw L2 would probe
    similarly-scaled clusters instead of similarly-directed ones) — then
    exact-rerank only the ``nprobe`` nearest cells' members: candidates ∝
    probed-cell occupancy, never a full scan (and with cell-partitioned
    parquet, a partition-pruned read)."""
    import numpy as np

    from grafeo_spark.llm.similarity import topk

    cent = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    if metric == "cosine":
        norms = np.linalg.norm(cent, axis=1, keepdims=True)
        cent_r = cent / np.where(norms == 0, 1.0, norms)
        q_r = q / (np.linalg.norm(q) or 1.0)
        score = cent_r @ q_r
        order = np.argsort(-score)
    elif metric == "dot":
        order = np.argsort(-(cent @ q))
    elif metric == "manhattan":
        order = np.argsort(np.abs(cent - q[None, :]).sum(axis=1))
    else:  # euclidean
        order = np.argsort(((cent - q[None, :]) ** 2).sum(axis=1))
    probes = [int(c) for c in order[:nprobe]]
    cands = cells_df.filter(F.col(cell_col).isin(probes))
    return topk(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col, metric=metric)


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
