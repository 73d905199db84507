"""Synthesize a larger scale factor from sf0.1 for the scale rehearsal
(VERDICT r4 "Next round" #3).

Makes K shifted copies of every fact table (dims region/nation stay fixed,
as in TPC-H): natural keys shift by copy*(max_key+1) and every foreign key
shifts by its referenced table's offset, so referential integrity and the
join/degree structure replicate exactly. Content columns are decorrelated
across copies so dedup/ANN output scales linearly instead of quadratically
in K (which would measure output size, not operator scaling):

- documents.text gets a copy-marker token spliced in every 5 words for
  copies > 0 (inter-copy Jaccard ~0.25, far below the 0.6/0.8 thresholds);
- embeddings.embedding gets a per-(copy, dim) deterministic sign mask
  (copies are ~orthogonal; per-vector statistics unchanged).

Usage: python scripts/make_scale_data.py [K] [OUT_DIR]
Defaults: K=10, OUT_DIR=/tmp/scale_sf1 (≈ sf1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# table -> (natural key, {fk_col: referenced_table})
KEYS = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        None,
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": (None, {"user_id": "events_user"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}


def main() -> None:
    from pyspark.sql import functions as F

    from grafeo_spark.catalog import TABLES, load_tables
    from grafeo_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    spark = get_spark("scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SRC)

    offsets: dict[str, int] = {}
    for name, (key, _) in KEYS.items():
        if key is not None:
            offsets[name] = int(t[name].agg(F.max(key)).first()[0]) + 1
    offsets["events_user"] = int(t["events"].agg(F.max("user_id")).first()[0]) + 1

    for name in TABLES:
        df = t[name]
        if name in ("region", "nation"):
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            continue
        key, fks = KEYS[name]
        parts = []
        for i in range(k):
            cur = df
            if i > 0:
                if key is not None:
                    cur = cur.withColumn(key, F.col(key) + F.lit(i * offsets[name]))
                for fk, ref in fks.items():
                    cur = cur.withColumn(fk, F.col(fk) + F.lit(i * offsets[ref]))
                if name == "documents":
                    cur = cur.withColumn(
                        "text",
                        F.expr(
                            "array_join(flatten(transform(split(text, ' '), "
                            f"(w, j) -> CASE WHEN j % 5 = 0 THEN array('c{i}', w) "
                            "ELSE array(w) END)), ' ')"
                        ),
                    )
                if name == "embeddings":
                    cur = cur.withColumn(
                        "embedding",
                        F.expr(
                            "transform(embedding, (x, j) -> "
                            f"CASE WHEN pmod(hash(j, {i}), 2) = 0 THEN -x ELSE x END)"
                        ),
                    )
            parts.append(cur)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: {k}x written", file=sys.stderr)
    print(out_dir)


if __name__ == "__main__":
    main()
