"""Adversarial-skew dedup rehearsal (VERDICT r7 'Next round' #6).

Synthesizes the documented LSH worst case — a corpus of NEAR-identical
but byte-distinct documents (shared boilerplate, one varying token,
pairwise Jaccard ~0.9) — at sizes where every (band, bh) bucket goes hot
and the adaptive salted re-split actually fires, then measures:

- dedup_near survivors: must be EXACT (one survivor for the hot cluster
  + each unrelated doc) — cluster recall through the salt is the claim
  that matters for dedup, and it holds because the verified pair graph
  over the cluster stays connected even when per-pair recall pays the
  (1 - 1/s)^m salting margin;
- near_duplicate_pairs recall at two bucket caps — the measured recall
  vs the cap, demonstrating the documented bounded-work/recall trade
  and that measured recall clears the formula's prediction;
- wall time at two corpus sizes — per-task work is bounded by
  max_bucket, so total work (and wall on a fixed machine) should grow
  ~linearly in N at fixed cap, not quadratically.

Usage: python scripts/skew_proof.py [N] (default 10000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus(spark, n: int, n_distinct: int = 20):
    boiler = [f"word{k}" for k in range(60)]
    rows = []
    for i in range(n):
        toks = list(boiler)
        toks[30] = f"uniq{i}"
        rows.append((i, " ".join(toks)))
    for j in range(n_distinct):
        rows.append(
            (
                n + j,
                f"totally different document number {j} about spark "
                + " ".join(f"x{j}y{k}" for k in range(20)),
            )
        )
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000

    from grafeo_spark.llm import dedup_near, near_duplicate_pairs
    from grafeo_spark.session import get_spark

    spark = get_spark("grafeo-skew-proof")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n": n}

    docs = corpus(spark, n).localCheckpoint(eager=True)
    expected_pairs = n * (n - 1) // 2

    for cap in (1024, 4096):
        t0 = time.perf_counter()
        got = near_duplicate_pairs(docs, threshold=0.8, max_bucket=cap).count()
        dt = time.perf_counter() - t0
        out[f"pairs_cap{cap}"] = {
            "recall": round(got / expected_pairs, 4),
            "sec": round(dt, 1),
        }
        print(f"pairs cap={cap}: recall {got}/{expected_pairs} in {dt:.1f}s", file=sys.stderr)

    for size in (n // 2, n):
        d = corpus(spark, size).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        kept = sorted(
            r[0]
            for r in dedup_near(d, threshold=0.8, max_bucket=1024)
            .select("doc_id")
            .collect()
        )
        dt = time.perf_counter() - t0
        exact = kept == [0] + [size + j for j in range(20)]
        out[f"dedup_near_n{size}"] = {"survivors_exact": exact, "sec": round(dt, 1)}
        print(f"dedup_near n={size}: exact={exact} in {dt:.1f}s", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
