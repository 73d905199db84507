"""Dump .explain("formatted") for declared battery entries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [name ...]

Writes plans/<tag>/<name>_<suffix>.txt for each entry (suffix from
--suffix, default the tag's trailing word, e.g. "before"/"after").
Building a query's DataFrame may execute driver-side preparatory jobs
(mutations, adaptive probes), so this runs a real session; the explain
itself does not execute the plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "before"
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    tag, names = args[0], args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from grafeo_spark.session import get_spark

    spark = get_spark("grafeo-plans")
    spark.sparkContext.setLogLevel("ERROR")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    qs = entry.queries()
    todo = names or list(qs)
    for name in todo:
        if name not in qs:
            print(f"{name}: unknown entry", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR building plan: {ex}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
