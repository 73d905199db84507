"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry through Spark AND its
``oracle_sql()`` through DuckDB on the same parquet tables, then compares
row count, column names, and canonicalized values. Usage:

    python scripts/check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "NaN"
            if isinstance(v, list):
                v = tuple(v)
            vals.append((str(type(v).__name__)[:1], str(v)))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from grafeo_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle, rows-only check)")
            n_pass += 1
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = [tuple(r) for r in ores.fetchall()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        sc, sv = canon(scols, srows)
        oc, ov = canon(ocols, orows)
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
            n_fail += 1
        elif sc != oc:
            print(f"FAIL {name}: cols {sc} vs {oc}")
            n_fail += 1
        elif sv != ov:
            bad = next(i for i, (a, b) in enumerate(zip(sv, ov)) if a != b)
            print(f"FAIL {name}: values differ, first at sorted row {bad}:")
            print(f"  spark : {sv[bad]}")
            print(f"  oracle: {ov[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
