"""Per-job timing probe for a battery entry (guide §1.1/§7.1).

Runs one entry in a fresh warm session with a Spark listener counting
jobs/stages/tasks and wall time between jobs, so driver-latency-bound
entries (many tiny jobs) can be told apart from compute-bound ones.

Usage: python scripts/probe_jobs.py name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from grafeo_spark.session import get_spark

    spark = get_spark("grafeo-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm pass
    from grafeo_spark.catalog import load_tables

    for _n, df in load_tables(spark, sf_dir).items():
        df.count()

    qs = entry.queries()
    for name in names:
        for attempt in (1, 2):
            tracker = sc.statusTracker()
            before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            jobs = [j for j in (tracker.getJobIdsForGroup(None) or []) if j not in before]
            njobs = len(jobs)
            # per-job durations via the REST-ish status API
            tot_job = 0.0
            stages = 0
            tasks = 0
            for j in sorted(jobs):
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                stages += len(ji.stageIds)
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        tasks += si.numTasks
            print(
                f"{name} run{attempt}: {dt:.2f}s rows={n} jobs={njobs} "
                f"stages={stages} tasks={tasks} "
                f"(~{dt / max(njobs, 1) * 1000:.0f} ms/job)",
                flush=True,
            )


if __name__ == "__main__":
    main()
