"""Vector similarity search: brute-force exact top-k and SRP-LSH ANN.

Replaces the reference's HNSW/VectorScan/VectorJoin stack
(crates/grafeo-core/src/execution/operators/scan_vector.rs:44,
vector_join.rs:45, index/vector/hnsw.rs) with the two Spark-shaped
strategies:

- **brute-force**: distance expression (pure Catalyst `zip_with` +
  `aggregate`, functions/vector.py) + TakeOrderedAndProject top-k — exact,
  one scan, the correctness baseline;
- **SRP-LSH (signed random projections)**: hyperplane sign bits → bucket
  code → candidates from matching buckets (with optional multi-probe bit
  flips) → exact rerank of candidates only. The scale path: the join key
  is the bucket code, never an n×m cross product.

Seeded numpy generates the hyperplanes deterministically on the driver.
The hot path computes ALL tables' bucket codes in one Arrow-batched
pandas_udf against a sparkContext-broadcast (tables, nbits, dim) plane
tensor — plan size is constant in embedding dim and table count, so the
family survives production dims (768-1536) with 20-40 tables, where the
literal-unrolled expression form would put 10⁵-10⁶ nodes in one plan and
knock out whole-stage codegen.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from grafeo_spark.functions import vector as vfn

METRICS = {
    "cosine": (vfn.cosine_similarity, False),  # (fn, smaller_is_better)
    "dot": (vfn.dot_product, False),
    "euclidean": (vfn.euclidean_distance, True),
    "manhattan": (vfn.manhattan_distance, True),
}


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec]).cast("array<double>")


def topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k (id, score) for one query vector — brute-force scan;
    Catalyst rewrites orderBy+limit to TakeOrderedAndProject (VectorScan
    brute-force path, scan_vector.rs)."""
    fn, asc = METRICS[metric]
    score = fn(F.col(vec_col).cast("array<double>"), _vec_lit(query_vec))
    out = df.select(F.col(id_col).alias("id"), score.alias("score"))
    key = F.col("score").asc() if asc else F.col("score").desc()
    return out.orderBy(key, F.col("id").asc()).limit(k)


def similarity_join(
    queries: DataFrame,
    items: DataFrame,
    k: int = 1,
    query_id: str = "vec_id",
    item_id: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact k-NN join: (query_id, item_id, score, rank) for each query's
    top-k items (VectorJoin semantics, vector_join.rs:45). Brute-force
    n×m arithmetic; the cosine path runs BLAS-blocked (one matmul per
    block pair, candidates pruned to per-cell top-k before the global
    rank) instead of a per-pair Catalyst fold — at dim 768 the
    interpreted fold dominates the cross join by ~an order of magnitude.
    Use `ann_join` at scale for sublinear candidate generation."""
    fn, asc = METRICS[metric]
    q = queries.select(F.col(query_id).alias("qid"), F.col(vec_col).cast("array<double>").alias("_qv"))
    it = items.select(F.col(item_id).alias("iid"), F.col(vec_col).cast("array<double>").alias("_iv"))
    if metric == "cosine":
        scored = _blocked_topk_join(q, it, k)
    else:
        scored = q.crossJoin(it).select(
            "qid", "iid", fn(F.col("_qv"), F.col("_iv")).alias("score")
        )
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col("iid").asc()]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "iid", "score", "rank")
    )


def _blocked_topk_join(q: DataFrame, it: DataFrame, k: int) -> DataFrame:
    """Exact cosine candidates for a bipartite top-k join, BLAS-blocked:
    hash both sides into ~4096-row blocks, cross-join the block tables
    (tiny), compute each cell's full similarity matrix as one matmul, and
    emit only each query's within-cell top-k — INCLUDING every item tied
    at the k-th score, so the global (score desc, iid asc) rank sees
    exactly the rows the unpruned join would have ranked. Emit volume is
    ~|Q| x item_blocks x k instead of |Q| x |I|.

    ``q`` columns (qid, _qv); ``it`` columns (iid, _iv)."""
    import pandas as pd

    # null vectors would desynchronize collect_list(id) (keeps the row)
    # from collect_list(vec) (drops it), scrambling the reshape — drop
    # them up front (a null embedding has no defined cosine anyway)
    q = q.filter(F.col("_qv").isNotNull())
    it = it.filter(F.col("_iv").isNotNull())
    nq, ni = q.count(), it.count()
    # cell count is qB x iB; bound the PRODUCT the same way the all-pairs
    # guard bounds B^2 (each side alone may be large if the other is tiny)
    if nq * ni > EXACT_PAIRS_MAX_ROWS**2:
        raise ValueError(
            f"_blocked_topk_join: {nq:,} x {ni:,} exact join exceeds the "
            "guarded cell budget; use ann_join for sublinear candidates "
            "or raise SPARK_GRAFT_EXACT_PAIRS_MAX."
        )
    # Block tables are built PARTITION-LOCALLY (r13): blocks are arbitrary
    # row groups, and the within-cell top-k keeps every tie at the k-th
    # score, so the global rank is invariant to block composition — there
    # is no reason to shuffle the full vector corpus through a hash
    # groupBy just to form them (at the 5M-vector decade that exchange
    # dominated the whole join). coalesce() first so fragmented scans
    # don't yield thousands of tiny blocks; it is narrow (no shuffle).
    qb = _chunked_blocks(q.coalesce(_n_blocks_for(nq)), "qid", "_qv", "qids", "qflat")
    ib = _chunked_blocks(it.coalesce(_n_blocks_for(ni)), "iid", "_iv", "iids", "iflat")
    cells = qb.crossJoin(ib)

    def score(batches):
        import numpy as np

        def mat(ids_cell, flat_cell):
            ids = np.asarray(ids_cell, dtype=np.int64)
            m = np.array(flat_cell, dtype=np.float64, copy=True).reshape(len(ids), -1)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
            order = np.argsort(ids)
            return ids[order], m[order]

        for pdf in batches:
            out_q, out_i, out_s = [], [], []
            for row in pdf.itertuples(index=False):
                qi, Qm = mat(row.qids, row.qflat)
                ii, Im = mat(row.iids, row.iflat)
                S = Qm @ Im.T
                kk = min(k, S.shape[1])
                kth = np.partition(S, S.shape[1] - kk, axis=1)[:, S.shape[1] - kk]
                mask = S >= kth[:, None]
                r_idx, c_idx = np.nonzero(mask)
                out_q.append(qi[r_idx])
                out_i.append(ii[c_idx])
                out_s.append(S[r_idx, c_idx])
            if out_q:
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "iid": np.concatenate(out_i),
                        "score": np.concatenate(out_s),
                    }
                )
            else:
                yield pd.DataFrame({"qid": [], "iid": [], "score": []}).astype(
                    {"qid": "int64", "iid": "int64", "score": "float64"}
                )

    return cells.mapInPandas(score, "qid long, iid long, score double")


# --------------------------------------------------------------------- #
# SRP-LSH (signed random projections)
# --------------------------------------------------------------------- #


def _planes(dim: int, nbits: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def _plane_tensor(dim: int, nbits: int, seed: int, tables: int = 1):
    """(tables, nbits, dim) hyperplane tensor; table t seeds at
    seed + 1000*t — the seeding contract the DuckDB oracles replay."""
    import numpy as np

    return np.stack([_planes(dim, nbits, seed + 1000 * t) for t in range(tables)])


def srp_code(vec: Column, planes) -> Column:
    """Bucket code as a pure-Catalyst expression: bit i = sign(vec · plane_i),
    packed into a long. This is the *oracle-replay shape* (the DuckDB
    oracles fold the same planes into SQL literals) — NOT the hot path:
    unrolling nbits × dim literals per table makes plan size O(tables ×
    nbits × dim), which at production dims (768+) and 20+ tables is 10⁵-10⁶
    expression nodes. All runtime callers use `_srp_codes_col` (one
    Arrow-batched pass over a broadcast plane tensor) instead."""
    code = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = vfn.dot_product(vec, _vec_lit(p))
        code = code + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return code


# Plane-tensor broadcasts keyed by (applicationId, dim, nbits, tables,
# seed): the tensor is a pure function of those, so re-broadcasting one
# per call only accumulates executor-side blocks in long-lived sessions.
# The appId in the key keeps a fresh SparkSession from reusing a dead
# broadcast.
_PLANE_BC_CACHE: dict = {}


def _plane_broadcast(sc, tensor, cache_key=None):
    import numpy as np

    if cache_key is not None:
        key = (sc.applicationId,) + tuple(cache_key)
        bc = _PLANE_BC_CACHE.get(key)
        if bc is not None:
            return bc
    bc = sc.broadcast(np.ascontiguousarray(tensor, dtype=np.float64))
    if cache_key is not None:
        # evict entries keyed to dead applications: a restarted
        # SparkSession gets a new appId, and the old session's broadcast
        # handles would otherwise pin driver memory forever (and would be
        # dead handles if ever returned)
        for stale in [k for k in _PLANE_BC_CACHE if k[0] != sc.applicationId]:
            del _PLANE_BC_CACHE[stale]
        _PLANE_BC_CACHE[key] = bc
    return bc


def _srp_codes_col(df: DataFrame, vec_col: str, tensor, cache_key=None) -> Column:
    """All tables' bucket codes in ONE Arrow-batched pandas_udf:
    ``sign(V @ planes.T)`` bit-packed per table, against a sparkContext
    broadcast of the (tables, nbits, dim) plane tensor. Plan size is
    constant in dim/nbits/tables (one UDF node); per-batch cost is one
    BLAS matmul. Bit convention identical to `srp_code` (strict dot > 0,
    bit i weight 1 << i) so the seeded oracles replay bit-for-bit.

    ``cache_key`` — pass (dim, nbits, tables, seed) to reuse one broadcast
    per tensor per session instead of accumulating blocks.

    Returns an ``array<long>`` column, element t = table t's code."""
    import numpy as np

    bc = _plane_broadcast(df.sparkSession.sparkContext, tensor, cache_key)

    @F.pandas_udf("array<long>")
    def codes(v: pd.Series) -> pd.Series:
        t = bc.value
        tables, nbits, dim = t.shape
        if len(v) == 0:
            return pd.Series([], dtype=object)
        V = np.array(v.tolist(), dtype=np.float64)
        bits = (V @ t.reshape(tables * nbits, dim).T) > 0
        weights = np.int64(1) << np.arange(nbits, dtype=np.int64)
        out = bits.reshape(-1, tables, nbits).astype(np.int64) @ weights
        return pd.Series(list(out))

    return codes(F.col(vec_col))


def add_srp_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    nbits: int = 8,
    seed: int = 42,
    dim: Optional[int] = None,
) -> DataFrame:
    """Append a `bucket` column — precompute once, write bucketed parquet
    partitioned by it for index-like reuse (the HNSW substitute). The code
    is computed by the Arrow-batched broadcast-tensor pass, so plan size
    stays constant at any embedding dim."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    tensor = _plane_tensor(dim, nbits, seed, tables=1)
    codes = _srp_codes_col(df, vec_col, tensor, cache_key=(dim, nbits, 1, seed))
    return df.withColumn("bucket", codes.getItem(0))


def _probe_codes(qcode: int, nbits: int, multiprobe: int) -> list[int]:
    """The query code's probe set: all codes within Hamming distance
    <= multiprobe (0, 1 or 2 bit flips)."""
    probes = {qcode}
    if multiprobe >= 1:
        probes |= {qcode ^ (1 << i) for i in range(nbits)}
    if multiprobe >= 2:
        probes |= {
            qcode ^ (1 << i) ^ (1 << j)
            for i in range(nbits)
            for j in range(i + 1, nbits)
        }
    return sorted(int(p) for p in probes)


def ann_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    nbits: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
    tables: int = 12,
) -> DataFrame:
    """Approximate top-k with MULTI-TABLE SRP probing: ``tables``
    independent hyperplane tables (table t seeded at seed + 1000*t, the
    same contract as `cosine_near_pairs`); a row is a candidate when ANY
    table's code falls within Hamming distance <= multiprobe of the
    query's code in that table; exact rerank of the candidates only.

    Single-table SRP degrades as dim grows — at dim 768 one 8-bit table
    with multiprobe=2 measured recall@10 = 0.5 (BENCH_SCALE.md) because
    a true neighbor's 8 bits must ALL land near the query's in the one
    table. With T tables the miss probability decays as (1-p_table)^T
    while the candidate fraction stays the probe-set union, so the
    recall/scan trade is tunable. Defaults (12 tables, 8 bits,
    multiprobe=1) measure recall@10 >= 0.9 at dim 768 on a clustered
    corpus while scanning a bounded candidate fraction
    (scripts/ann_dim_proof.py; reference recall bar:
    crates/grafeo-core/src/index/vector/hnsw.rs:5-8).

    All tables' codes are computed in ONE Arrow-batched pass against a
    session-cached broadcast plane tensor, so plan size stays constant
    in dim and table count. Table 0's planes equal the single-table
    seeding, so tables=1 reproduces the legacy probe set exactly."""
    import numpy as np

    dim = len(query_vec)
    tensor = _plane_tensor(dim, nbits, seed, tables)
    q = np.asarray(query_vec, dtype=np.float64)
    weights = np.int64(1) << np.arange(nbits, dtype=np.int64)
    qcodes = ((tensor @ q) > 0).astype(np.int64) @ weights  # (tables,)
    codes = _srp_codes_col(df, vec_col, tensor, cache_key=(dim, nbits, tables, seed))
    withc = df.withColumn("_codes", codes)
    cond = None
    for t in range(tables):
        c = F.col("_codes").getItem(t).isin(_probe_codes(int(qcodes[t]), nbits, multiprobe))
        cond = c if cond is None else (cond | c)
    cands = withc.filter(cond).drop("_codes")
    return topk(cands, query_vec, k, id_col, vec_col, metric)


# Max rows per BLAS block: a block pair holds two (rows × dim) float64
# matrices plus their (rows × rows) similarity matrix — at 4096 rows the
# similarity matrix is 4096² × 8 B ≈ 134 MB, a safe per-task ceiling.
_ROWS_PER_BLOCK = 4096


def _n_blocks_for(n_rows: int, rows_per_block: int = _ROWS_PER_BLOCK) -> int:
    import math

    return max(1, math.ceil(n_rows / rows_per_block))


def _chunked_blocks(
    df: DataFrame, id_col: str, vec_col: str, ids_name: str, flat_name: str
) -> DataFrame:
    """(ids array<bigint>, flat array<double>) block table built by
    chunking each partition into ~_ROWS_PER_BLOCK-row blocks — zero
    shuffle, in contrast to the hash-groupBy builder this replaced.
    Null vectors must already be filtered out by the caller."""
    import numpy as np
    import pandas as pd

    def chunk(batches):
        ids: list = []
        vecs: list = []

        def emit(id_slice, vec_slice):
            return pd.DataFrame(
                {
                    ids_name: [list(id_slice)],
                    flat_name: [
                        np.concatenate(
                            [np.asarray(v, dtype=np.float64) for v in vec_slice]
                        )
                    ],
                }
            )

        for pdf in batches:
            ids.extend(int(x) for x in pdf[id_col])
            vecs.extend(pdf[vec_col])
            while len(ids) >= _ROWS_PER_BLOCK:
                yield emit(ids[:_ROWS_PER_BLOCK], vecs[:_ROWS_PER_BLOCK])
                ids, vecs = ids[_ROWS_PER_BLOCK:], vecs[_ROWS_PER_BLOCK:]
        if ids:
            yield emit(ids, vecs)

    return df.mapInPandas(
        chunk, f"{ids_name} array<bigint>, {flat_name} array<double>"
    )


# The exact all-pairs path is O(B^2) block-pair cells by construction.
# Above this corpus size (~2.4k blocks -> ~3M cells) the job stops being
# a reasonable "just run it" default and the caller must either pass
# n_blocks explicitly (metadata row-count estimate is enough) or use the
# banded/ANN paths. Overridable for deliberate large runs.
EXACT_PAIRS_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_EXACT_PAIRS_MAX", 10_000_000))


def _guard_exact_pairs(n_rows: int, what: str) -> None:
    if n_rows > EXACT_PAIRS_MAX_ROWS:
        raise ValueError(
            f"{what}: corpus has {n_rows:,} rows; the exact blocked "
            f"all-pairs path is O(B\u00b2) in block count and above "
            f"{EXACT_PAIRS_MAX_ROWS:,} rows it will launch millions of "
            "block-pair cells. Pass n_blocks explicitly to accept the "
            "cost, raise SPARK_GRAFT_EXACT_PAIRS_MAX, or use the "
            "banded LSH path (embedding_near_pairs with threshold >= "
            "brute_force_below) / ann_join instead."
        )


def _blocked_exact_pairs(
    base: DataFrame, threshold: float, n_blocks: Optional[int] = None
) -> DataFrame:
    """Exact all-pairs cosine >= threshold, BLAS-blocked.

    The row-at-a-time formulation (crossJoin + Catalyst ``aggregate``
    lambdas) interprets the dot product per element — quadratic in rows AND
    interpreted per term. Instead: hash ids into ``n_blocks`` buckets,
    ``collect_list`` each bucket's vectors, join the O(B²/2) block pairs,
    and compute each block-pair's full similarity matrix as one numpy
    matmul inside ``mapInPandas`` (vectorized BLAS, Arrow-batched). Same
    O(n²) arithmetic, ~100× the throughput.

    ``n_blocks`` is derived from the corpus size (``ceil(n / 4096)``, one
    count job) so per-task memory stays bounded no matter how large the
    input — a fixed block count would grow each task's matrices linearly
    with the corpus. The sizing count is one full pass; at 100 TB pass
    ``n_blocks`` explicitly (a row-count estimate from table metadata is
    enough — the bound only needs the right order of magnitude) to skip
    it.

    ``base`` must have columns (id, _v: array<double>).
    """
    import pandas as pd

    base = base.filter(F.col("_v").isNotNull())  # see _blocked_topk_join
    if n_blocks is None:
        n = base.count()
        _guard_exact_pairs(n, "_blocked_exact_pairs")
        n_blocks = _n_blocks_for(n)
    withb = base.withColumn("_b", F.pmod(F.xxhash64("id"), F.lit(n_blocks)))
    # flat (ids, flattened matrix) layout — see _blocked_pair_scores: a
    # list<struct> column materializes per-element Python objects on the
    # Arrow->pandas boundary, which dominates at production dims
    grouped = withb.groupBy("_b").agg(
        F.collect_list("id").alias("ids"),
        F.flatten(F.collect_list("_v")).alias("flat"),
    )
    l = grouped.select(
        F.col("_b").alias("b1"), F.col("ids").alias("ids1"), F.col("flat").alias("flat1")
    )
    r = grouped.select(
        F.col("_b").alias("b2"), F.col("ids").alias("ids2"), F.col("flat").alias("flat2")
    )
    pairs = l.join(r, F.col("b1") <= F.col("b2"))

    def compute(batches):
        import numpy as np

        def mat(ids_cell, flat_cell):
            ids = np.asarray(ids_cell, dtype=np.int64)
            m = np.array(flat_cell, dtype=np.float64, copy=True).reshape(len(ids), -1)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            return ids, m

        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for row in pdf.itertuples(index=False):
                i1, v1 = mat(row.ids1, row.flat1)
                same = row.b1 == row.b2
                if same:
                    i2, v2 = i1, v1
                else:
                    i2, v2 = mat(row.ids2, row.flat2)
                s = v1 @ v2.T
                ii, jj = np.nonzero(s >= threshold)
                if same:
                    keep = i1[ii] < i2[jj]
                    ii, jj = ii[keep], jj[keep]
                a_ids, b_ids = i1[ii], i2[jj]
                lo = np.minimum(a_ids, b_ids)
                hi = np.maximum(a_ids, b_ids)
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(s[ii, jj])
            if out_a:
                yield pd.DataFrame(
                    {
                        "a": np.concatenate(out_a),
                        "b": np.concatenate(out_b),
                        "score": np.concatenate(out_s),
                    }
                )
            else:
                yield pd.DataFrame({"a": [], "b": [], "score": []}).astype(
                    {"a": "int64", "b": "int64", "score": "float64"}
                )

    return pairs.mapInPandas(compute, "a long, b long, score double")


def _blocked_pair_scores(
    base: DataFrame,
    pairs: DataFrame,
    threshold: float,
    n_blocks: Optional[int] = None,
) -> DataFrame:
    """Exact cosine for a CANDIDATE PAIR LIST, BLAS-vectorized.

    Per-pair Catalyst ``aggregate`` lambdas interpret the dot product per
    element — at dim 768 with 10⁷ candidates that is the plan's dominant
    cost (measured 9× the bucket join). Instead: hash ids into blocks,
    group candidate pairs by their (block_a, block_b), join each group
    with the two blocks' collected vectors, and score every group's pairs
    in one numpy row-wise einsum inside ``mapInPandas``. Per-task memory
    is two blocks of vectors plus the group's pair list; the pair list is
    ids only — vectors move once per (block, partner-block), never once
    per pair.

    ``base`` must have columns (id, _v: array<double>); ``pairs`` columns
    (a, b). Returns (a, b, score) for score >= threshold."""
    import math

    import pandas as pd

    base = base.filter(F.col("_v").isNotNull())  # see _blocked_topk_join
    if n_blocks is None:
        # Block-count tension: every block ships to each of its B partner
        # cells, so VECTOR traffic grows as 2·B·|V|·dim — B must stay
        # small — while pairs spread over B² cells, so per-cell pair lists
        # grow as P/B². The resolution: B only large enough to keep each
        # cell's collected pair list modest (~200k), and the scoring UDF
        # CHUNKS each cell's pairs so matrix allocations stay bounded
        # regardless of cell size. (B from sqrt(P/8k) looked right for
        # matrices but shipped 96 copies of the corpus at dim 768 —
        # GC-thrashed the executor heap.)
        pairs = pairs.localCheckpoint(eager=True)
        n_pairs = pairs.count()
        n_blocks = max(
            _n_blocks_for(base.count()),
            math.ceil(math.sqrt(max(n_pairs, 1) / 200_000.0)),
        )
    withb = base.withColumn("_b", F.pmod(F.xxhash64("id"), F.lit(n_blocks)))
    # FLAT layout, not list<struct>: Arrow->pandas turns nested structs
    # into per-element Python dicts/floats (10⁸ objects at dim 768 — the
    # conversion, not the math, dominated); plain array<long>/array<double>
    # columns arrive as numpy arrays zero-ish-copy.
    blocks = withb.groupBy("_b").agg(
        F.collect_list("id").alias("ids"),
        F.flatten(F.collect_list("_v")).alias("flat"),
    )
    # join hints (r11 scale finding, see dedup._content_members): the
    # id->block map is corpus-sized (never broadcastable at scale), and
    # the block frames carry ~25 MB flattened-matrix ROWS — a
    # misestimated broadcast of either would ship the whole corpus's
    # vectors to the driver; merge keeps them shuffled and streamed.
    p2 = (
        pairs.join(
            withb.select(F.col("id").alias("a"), F.col("_b").alias("_ba")).hint(
                "shuffle_hash"
            ),
            "a",
        )
        .join(
            withb.select(F.col("id").alias("b"), F.col("_b").alias("_bb")).hint(
                "shuffle_hash"
            ),
            "b",
        )
        .groupBy("_ba", "_bb")
        .agg(F.collect_list("a").alias("pa"), F.collect_list("b").alias("pb"))
    )
    joined = (
        p2.join(
            blocks.select(
                F.col("_b").alias("_ba"),
                F.col("ids").alias("ids_a"),
                F.col("flat").alias("flat_a"),
            ).hint("merge"),
            "_ba",
        ).join(
            blocks.select(
                F.col("_b").alias("_bb"),
                F.col("ids").alias("ids_b"),
                F.col("flat").alias("flat_b"),
            ).hint("merge"),
            "_bb",
        )
    )

    CHUNK = 65536  # pairs scored per gather/einsum allocation

    def score(batches):
        import numpy as np

        def block_matrix(ids_cell, flat_cell):
            ids = np.asarray(ids_cell, dtype=np.int64)
            # copy: Arrow-backed buffers arrive read-only
            M = np.array(flat_cell, dtype=np.float64, copy=True).reshape(len(ids), -1)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            order = np.argsort(ids)
            return ids[order], M[order]

        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for row in pdf.itertuples(index=False):
                ids_a, A = block_matrix(row.ids_a, row.flat_a)
                ids_b, Bm = block_matrix(row.ids_b, row.flat_b)
                a_ids = np.asarray(row.pa, dtype=np.int64)
                b_ids = np.asarray(row.pb, dtype=np.int64)
                # id -> block-row position, all-vectorized (no per-pair
                # Python): sorted block ids + searchsorted gathers
                pos_a = np.searchsorted(ids_a, a_ids)
                pos_b = np.searchsorted(ids_b, b_ids)
                for lo in range(0, len(a_ids), CHUNK):
                    sl = slice(lo, lo + CHUNK)
                    s = np.einsum("ij,ij->i", A[pos_a[sl]], Bm[pos_b[sl]])
                    keep = s >= threshold
                    out_a.append(a_ids[sl][keep])
                    out_b.append(b_ids[sl][keep])
                    out_s.append(s[keep])
            if out_a:
                yield pd.DataFrame(
                    {
                        "a": np.concatenate(out_a),
                        "b": np.concatenate(out_b),
                        "score": np.concatenate(out_s),
                    }
                )
            else:
                yield pd.DataFrame({"a": [], "b": [], "score": []}).astype(
                    {"a": "int64", "b": "int64", "score": "float64"}
                )

    return joined.mapInPandas(score, "a long, b long, score double")


def _bipartite_pair_scores(
    qv: DataFrame,
    iv: DataFrame,
    pairs: DataFrame,
    nq_blocks: Optional[int] = None,
    ni_blocks: Optional[int] = None,
) -> DataFrame:
    """Exact cosine for a candidate (qid, iid) pair list whose two sides
    are SEPARATE tables, BLAS-vectorized with side-pure blocks.

    The shared-id-space scorer (_blocked_pair_scores via an id remap)
    puts queries into MIXED blocks: every (query-block, item-block) cell
    then ships a full ~4096-vector block for the handful of queries it
    actually contains — measured 13×-superlinear at 200 queries × 100k
    items, dim 768 (~31 GB of block traffic). Side-pure blocks make the
    traffic iB×|Q| + qB×|I|: each item block moves once per query block
    with pairs against it, and the (usually tiny) query blocks ride
    along nearly free.

    ``qv`` columns (qid, _qv); ``iv`` columns (iid, _iv); ``pairs``
    columns (qid, iid). Returns (qid, iid, score)."""
    import pandas as pd

    qv = qv.filter(F.col("_qv").isNotNull())  # see _blocked_topk_join
    iv = iv.filter(F.col("_iv").isNotNull())
    if nq_blocks is None:
        nq_blocks = _n_blocks_for(qv.count())
    if ni_blocks is None:
        ni_blocks = _n_blocks_for(iv.count())
    qwb = qv.withColumn("_qb", F.pmod(F.xxhash64("qid"), F.lit(nq_blocks)))
    iwb = iv.withColumn("_ib", F.pmod(F.xxhash64("iid"), F.lit(ni_blocks)))
    qblocks = qwb.groupBy("_qb").agg(
        F.collect_list("qid").alias("qids"),
        F.flatten(F.collect_list("_qv")).alias("qflat"),
    )
    iblocks = iwb.groupBy("_ib").agg(
        F.collect_list("iid").alias("iids"),
        F.flatten(F.collect_list("_iv")).alias("iflat"),
    )
    # same hint rationale as _blocked_pair_scores: id->block maps are
    # input-sized, block frames carry flattened-matrix rows
    p2 = (
        pairs.join(qwb.select("qid", "_qb").hint("merge"), "qid")
        .join(iwb.select("iid", "_ib").hint("merge"), "iid")
        .groupBy("_qb", "_ib")
        .agg(F.collect_list("qid").alias("pq"), F.collect_list("iid").alias("pi"))
    )
    joined = p2.join(qblocks.hint("merge"), "_qb").join(iblocks.hint("merge"), "_ib")

    CHUNK = 65536  # pairs scored per gather/einsum allocation

    def score(batches):
        import numpy as np

        def block_matrix(ids_cell, flat_cell):
            ids = np.asarray(ids_cell, dtype=np.int64)
            M = np.array(flat_cell, dtype=np.float64, copy=True).reshape(len(ids), -1)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            order = np.argsort(ids)
            return ids[order], M[order]

        for pdf in batches:
            out_q, out_i, out_s = [], [], []
            for row in pdf.itertuples(index=False):
                q_ids, Qm = block_matrix(row.qids, row.qflat)
                i_ids, Im = block_matrix(row.iids, row.iflat)
                pq = np.asarray(row.pq, dtype=np.int64)
                pi = np.asarray(row.pi, dtype=np.int64)
                pos_q = np.searchsorted(q_ids, pq)
                pos_i = np.searchsorted(i_ids, pi)
                for lo in range(0, len(pq), CHUNK):
                    sl = slice(lo, lo + CHUNK)
                    s = np.einsum("ij,ij->i", Qm[pos_q[sl]], Im[pos_i[sl]])
                    out_q.append(pq[sl])
                    out_i.append(pi[sl])
                    out_s.append(s)
            if out_q:
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "iid": np.concatenate(out_i),
                        "score": np.concatenate(out_s),
                    }
                )
            else:
                yield pd.DataFrame({"qid": [], "iid": [], "score": []}).astype(
                    {"qid": "int64", "iid": "int64", "score": "float64"}
                )

    return joined.mapInPandas(score, "qid long, iid long, score double")


def srp_tables_for_threshold(
    threshold: float, nbits: int, target_miss: float = 1e-6
) -> int:
    """Number of independent SRP tables so a pair at the given cosine
    threshold shares >= 1 bucket with probability 1 - target_miss.
    Per-bit agreement is 1 - acos(cos) / pi (Goemans–Williamson); a table
    matches when all nbits agree."""
    import math

    p_bit = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    p_table = p_bit**nbits
    if p_table >= 1.0:
        return 1
    return max(1, math.ceil(math.log(target_miss) / math.log(1.0 - p_table)))


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    tables: Optional[int] = None,
    seed: int = 42,
    brute_force_below: float = 0.7,
    dim: Optional[int] = None,
) -> DataFrame:
    """(a, b, score) — all pairs with cosine similarity >= threshold (the
    embedding near-duplicate detector, completing the dedup family next to
    MinHash/SimHash).

    Scale path (high thresholds): multi-table SRP bucketing — ``tables``
    derived from the threshold so the miss probability stays under 1e-6 —
    then exact-cosine verification of bucket collisions only; the join key
    is (table, code), never n×m. Below ``brute_force_below`` hyperplane
    buckets stop pruning (per-bit agreement approaches 1/2, so every pair
    collides in some table) and the operator honestly switches to the
    exact all-pairs join rather than paying LSH overhead for no
    selectivity — LSH only earns its keep in its selectivity regime.
    """
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col).alias("id"), v.alias("_v"))
    if threshold < brute_force_below:
        return _blocked_exact_pairs(base, threshold)
    if tables is None:
        tables = srp_tables_for_threshold(threshold, nbits)
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    # All tables' codes in one Arrow-batched pass (broadcast plane tensor),
    # then posexplode to the (table, code) join key — same bucket topology
    # as the per-table union, at constant plan size in dim/nbits/tables.
    # Bucket rows carry IDS ONLY: shipping vectors through the bucket
    # self-join would move each vector once per table (24× at threshold
    # 0.9) and verify candidates with the interpreted per-element
    # aggregate — measured 9× the join cost at dim 768. Candidates dedup
    # to a bare (a, b) list first; exact verification then runs
    # BLAS-blocked (_blocked_pair_scores), moving each vector once per
    # partner block.
    tensor = _plane_tensor(dim, nbits, seed, tables)
    # materialize the (id, t, code) bucket table before the self-join:
    # tiny (tables rows per vector, three numeric columns), and without it
    # BOTH join sides re-run the Arrow codes pass and the join planner
    # sees no stats (profiled 10× slower end-to-end at dim 768)
    codes = _srp_codes_col(base, "_v", tensor, cache_key=(dim, nbits, tables, seed))
    buckets = (
        base.withColumn("_codes", codes)
        .select("id", F.posexplode("_codes").alias("t", "code"))
        .localCheckpoint(eager=True)
    )
    l = buckets.select("t", "code", F.col("id").alias("a"))
    r = buckets.select("t", "code", F.col("id").alias("b")).hint("merge")
    cands = (
        l.join(r, ["t", "code"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return _blocked_pair_scores(base, cands, threshold)


def ann_join(
    queries: DataFrame,
    items: DataFrame,
    k: int = 1,
    query_id: str = "vec_id",
    item_id: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    nbits: int = 8,
    seed: int = 42,
    tables: int = 12,
    multiprobe: int = 1,
    dim: Optional[int] = None,
) -> DataFrame:
    """Approximate k-NN join with MULTI-TABLE probing (r10 — matches
    ann_topk's recall fix; single-table bucketing had the same
    recall-at-production-dim flaw): both sides get all ``tables`` codes
    in one Arrow pass; the query side additionally explodes its
    multiprobe set (codes within Hamming ≤ multiprobe, as flipped-bit
    variants) so near-boundary neighbors still collide. The bucket join
    carries IDS ONLY — vectors would otherwise travel once per (table ×
    probe); candidates dedup to distinct (qid, iid) and the exact rerank
    joins the two vector tables back once. Shuffle ∝ bucket occupancy,
    never n×m."""
    fn, asc = METRICS[metric]
    if dim is None:
        dim = len(items.select(vec_col).first()[0])
    tensor = _plane_tensor(dim, nbits, seed, tables)
    key = (dim, nbits, tables, seed)
    qv = queries.select(
        F.col(query_id).alias("qid"), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    iv = items.select(
        F.col(item_id).alias("iid"), F.col(vec_col).cast("array<double>").alias("_iv")
    )
    # probe-set explosion on the (usually smaller) query side: the exact
    # code plus every ≤ multiprobe bit-flip variant
    flips = [0]
    if multiprobe >= 1:
        flips += [1 << i for i in range(nbits)]
    if multiprobe >= 2:
        flips += [
            (1 << i) ^ (1 << j) for i in range(nbits) for j in range(i + 1, nbits)
        ]
    qcodes = qv.withColumn("_codes", _srp_codes_col(qv, "_qv", tensor, cache_key=key))
    qb = (
        qcodes.select("qid", F.posexplode("_codes").alias("t", "_c"))
        .withColumn("_f", F.explode(F.array(*[F.lit(f) for f in flips])))
        .select("qid", "t", F.col("_c").bitwiseXOR(F.col("_f")).alias("code"))
    )
    icodes = iv.withColumn("_codes", _srp_codes_col(iv, "_iv", tensor, cache_key=key))
    ib = icodes.select("iid", F.posexplode("_codes").alias("t", "code"))
    cands = qb.join(ib, ["t", "code"]).select("qid", "iid").distinct()
    if metric == "cosine":
        # BLAS-blocked exact rerank with SIDE-PURE blocks: joining
        # vectors per candidate pair and folding the dot product in
        # Catalyst measured 5× slower than even the full cross join at
        # dim 768, and a shared-id-space remap onto _blocked_pair_scores
        # measured 13×-superlinear at 100k items (queries landed in
        # mixed blocks, so each cell shipped a full item block for a
        # handful of queries — see _bipartite_pair_scores).
        scored = _bipartite_pair_scores(qv, iv, cands)
    else:
        scored = (
            cands.join(qv, "qid")
            .join(iv.hint("merge"), "iid")
            .select("qid", "iid", fn(F.col("_qv"), F.col("_iv")).alias("score"))
        )
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col("iid").asc()]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "iid", "score", "rank")
    )
