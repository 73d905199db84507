"""Scale rehearsal runner: one warm timing per entry at a given sf_dir.

Usage: python scripts/bench_scale.py SF_DIR [entry ...]
Prints one JSON line {"sf_dir": ..., "queries": {name: sec}}.
Pre-warms every source table (full count) so timings measure the query,
not the first parquet scan — comparable across scale factors.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = [
    "q1_pricing_summary",
    "flagship_customer_orders",
    "order_part_suppliers",
    "events_hourly_rollup",
    "sp_region_path_nodes",
    "alg_bfs_depths",
    "alg_pagerank_top",
    "dedup_exact_count",
    "dedup_near_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_pairs_sha256",
    "embedding_near_pairs",
    "sim_join_top2",
    "knn_cosine_top10",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_ENTRIES

    import __spark_entry__ as entry
    from grafeo_spark.catalog import load_tables
    from grafeo_spark.session import get_spark

    spark = get_spark("grafeo-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for name, df in load_tables(spark, sf_dir).items():
        df.count()

    import gc

    qs = entry.queries()
    out: dict[str, float] = {}
    for name in names:
        # release the previous entry's persisted/checkpointed frames so a
        # heavy neighbor's memory pressure doesn't bleed into this timing
        # (same rationale as bench.py's per-entry gc)
        gc.collect()
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = round(time.perf_counter() - t0, 3)
        out[name] = dt
        print(f"{name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
