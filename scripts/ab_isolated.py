"""Isolated A/B for battery entries (VERDICT r4 'What's wrong #1').

Runs named entries in a fresh session, each 3×, with an optional pre-warm
pass that touches the entry's source tables first (mirroring what a warm
battery position would inherit). Prints per-run timings to stderr and one
JSON line to stdout.

Usage: python scripts/ab_isolated.py [--cold] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cold = "--cold" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from grafeo_spark.session import get_spark

    spark = get_spark("grafeo-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    if not cold:
        # Warm pass: one full read of the tables the regressed entries use,
        # so run 1 measures the query rather than the first parquet scan.
        for t in ("documents", "embeddings"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    qs = entry.queries()
    out: dict[str, list[float]] = {}
    for name in args:
        runs = []
        for i in range(3):
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            runs.append(dt)
            print(f"{name} run{i + 1}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        out[name] = runs
    print(json.dumps({"cold": cold, "runs": out}))


if __name__ == "__main__":
    main()
