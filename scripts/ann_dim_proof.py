"""Production-dimension ANN rehearsal (follow-up to the r8 SRP rewrite).

The r7 verdict's scale-killer was plan size at real embedding dims; the
rewrite moved bucketing into one Arrow-batched broadcast-tensor pass.
This measures the whole family EXECUTING at dim=768 — the regime the
old literal-unrolled plan could not plan, let alone run:

- build + run cosine_near_pairs (24 tables, threshold 0.9) over N
  clustered vectors, checking recall against planted near-duplicate
  pairs (ground truth by construction);
- ann_topk at multiprobe=2 vs exact topk (recall@10).

Usage: python scripts/ann_dim_proof.py [N] [DIM] (default 20000 768)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768

    import numpy as np

    from grafeo_spark.llm import ann_topk, cosine_near_pairs, topk
    from grafeo_spark.session import get_spark

    spark = get_spark("grafeo-ann-dim")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(42)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near-duplicates: vectors i and i+1 for even i < 2*K are
    # small perturbations of each other (cosine ~0.995)
    K = 500
    for i in range(0, 2 * K, 2):
        base[i + 1] = base[i] + 0.07 * rng.standard_normal(dim).astype(np.float32)
    ids = list(range(n))
    df = spark.createDataFrame(
        [(i, base[i].tolist()) for i in ids], "vec_id long, embedding array<float>"
    ).repartition(32).localCheckpoint(eager=True)

    out: dict = {"n": n, "dim": dim}

    t0 = time.perf_counter()
    pairs = cosine_near_pairs(df, threshold=0.9, nbits=8, tables=24, dim=dim)
    got = {(r.a, r.b) for r in pairs.collect()}
    dt = time.perf_counter() - t0
    planted = {(i, i + 1) for i in range(0, 2 * K, 2)}
    found = len(got & planted)
    out["near_pairs"] = {
        "recall": round(found / K, 4),
        "extra_pairs": len(got - planted),
        "sec": round(dt, 1),
    }
    print(f"near_pairs: recall {found}/{K}, {len(got)} total, {dt:.1f}s", file=sys.stderr)

    q = base[0].tolist()
    t0 = time.perf_counter()
    approx = [r.id for r in ann_topk(df, q, k=10, nbits=8, multiprobe=2).collect()]
    dt_ann = time.perf_counter() - t0
    exact = [r.id for r in topk(df, q, k=10).collect()]
    out["ann_topk"] = {
        "recall_at_10": round(len(set(approx) & set(exact)) / 10, 2),
        "sec": round(dt_ann, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
