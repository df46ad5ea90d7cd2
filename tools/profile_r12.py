"""Round-12 optimization profiler: decompose per-query wall time.

For each named query, separately time:
- build   — calling the queries() lambda (this is where EAGER work inside
            the builder runs: localCheckpoint jobs, bounded collects,
            trainer rounds);
- plan    — forcing analysis + optimization + physical planning of the
            RESULT DataFrame (queryExecution().executedPlan());
- exec    — .collect() of the planned DataFrame;
and count the Spark jobs each phase submitted (statusTracker job ids).

This is the guide-section-1 "where does the time actually go" split the
bench's end-to-end numbers cannot show: a query dominated by `build` needs
fewer checkpoint barriers / fewer trainer jobs, one dominated by `plan`
needs a smaller expression tree, one dominated by `exec` needs a better
physical plan.

Usage: python tools/profile_r12.py [query ...]   (default: bench queries)
       env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PROFILE_N
            (reps, default 2 — the SECOND rep is reported so one-time
            codegen/JIT warmup is excluded, mirroring bench.py's warmup)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dask_mwu_spark import release_caches
from dask_mwu_spark.session import get_spark


def job_count(sc) -> int:
    ids = sc.statusTracker().getJobIdsForGroup(None)
    return len(ids)


def profile_one(spark, qs, name: str, sf_dir: str) -> dict:
    # job_count snapshots bracket each phase (ADVICE r12: the docstring
    # promised per-phase job counts but profile_one never called it) —
    # build_jobs is the eager-barrier count the checkpoint/trainer
    # optimizations move, exec_jobs the action's own job count
    sc = spark.sparkContext
    sc.setJobDescription(f"profile:{name}")
    j0 = job_count(sc)
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    t1 = time.time()
    j1 = job_count(sc)
    _ = df._jdf.queryExecution().executedPlan()
    t2 = time.time()
    j2 = job_count(sc)
    rows = df.collect()
    t3 = time.time()
    j3 = job_count(sc)
    sc.setJobDescription(None)
    return {
        "build_s": round(t1 - t0, 3),
        "plan_s": round(t2 - t1, 3),
        "exec_s": round(t3 - t2, 3),
        "total_s": round(t3 - t0, 3),
        "build_jobs": j1 - j0,
        "plan_jobs": j2 - j1,
        "exec_jobs": j3 - j2,
        "rows": len(rows),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_reps = int(os.environ.get("SPARK_GRAFT_PROFILE_N", "2"))
    spark = get_spark(
        "profile-r12", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    import bench as benchmod

    names = sys.argv[1:] or [q for q in benchmod.BENCH_QUERIES if q in qs]
    out = {}
    for name in names:
        rec = None
        for _ in range(n_reps):
            rec = profile_one(spark, qs, name, sf_dir)
            release_caches()
        out[name] = rec
        print(
            f"{name:32s} total {rec['total_s']:7.3f}  "
            f"build {rec['build_s']:7.3f}  plan {rec['plan_s']:6.3f}  "
            f"exec {rec['exec_s']:7.3f}  rows {rec['rows']}"
        )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
        "profile.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
