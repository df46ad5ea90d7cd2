"""Registry-wide partitioning-invariance sweep: every registered query
must produce IDENTICAL results under radically different partitioning
regimes — the direct local evidence for the 1000-executor claim, where
scan splits, shuffle fan-out, and task interleavings all differ from
this box.

Two full passes over ``__spark_entry__.queries()`` at sf0.001:

- regime A (cluster-like): local[32], shuffle.partitions=32,
  maxPartitionBytes default (few fat scan partitions);
- regime B (adversarial): local[5], shuffle.partitions=7,
  maxPartitionBytes=64k (every parquet file splinters into many scan
  partitions), broadcast threshold lowered 64x (joins that were
  broadcast may become shuffle joins).

Each result is normalized exactly like tools/check_oracle.py (column
sort + row sort + dtype widening) and hashed; a query whose hash
differs between regimes has partitioning-dependent output — float fold
order, window tiebreak, or sampling leaking through — which would
surface as silent cross-run nondeterminism on a real cluster.

Ops-level invariance pytests exist for the riskiest kernels
(tests/test_partition_invariance_ext.py, the Lloyd trainer, bucketed
rank); this sweep is the registry-wide completeness version.

Run: python tools/invariance_sweep.py [sf_dir] [query ...]
Output: one line per query + a FAILURES count (0 = fully invariant).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REGIMES = {
    "A": {
        "master": "local[32]",
        "shuffle_partitions": 32,
        "extra_conf": {},
    },
    "B": {
        "master": "local[5]",
        "shuffle_partitions": 7,
        "extra_conf": {
            "spark.sql.files.maxPartitionBytes": str(64 * 1024),
            "spark.sql.autoBroadcastJoinThreshold": str(1024 * 1024),
        },
    },
}


def _normalize(df):
    """check_oracle.normalize, imported so the two tools cannot drift."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_oracle.py"),
    )
    co = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(co)
    return co.normalize(df)


def _run_pass(regime: str, sf_dir: str, only: set[str]) -> dict[str, str]:
    """One full registry pass under a regime; returns name -> value hash.
    Runs in THIS process — callers run passes sequentially, stopping the
    session between them (one SparkContext per process)."""
    import __spark_entry__ as entrymod
    from dask_mwu_spark import release_caches
    from dask_mwu_spark.cache import (
        gc_reclaim,
        jvm_cached_count,
        jvm_leaked_count,
    )
    from dask_mwu_spark.session import get_spark

    cfg = REGIMES[regime]
    spark = get_spark(
        f"invariance-{regime}",
        master=cfg["master"],
        shuffle_partitions=cfg["shuffle_partitions"],
        extra_conf=cfg["extra_conf"],
    )
    spark.sparkContext.setLogLevel("ERROR")
    hashes: dict[str, str] = {}
    n_run = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            pdf = _normalize(fn(spark, sf_dir).toPandas())
            # full-precision, dtype-tagged serialization: two frames hash
            # equal iff every value (incl. float bits at 17 sig digits)
            # and every dtype match
            blob = pdf.to_csv(index=False, float_format="%.17g") + str(
                list(pdf.dtypes)
            )
            hashes[name] = hashlib.md5(blob.encode()).hexdigest()
        except Exception as e:  # noqa: BLE001
            hashes[name] = f"ERROR: {e}"
        # dogfood the documented long-lived-session contract (VERDICT r7
        # item 8): this harness runs 200+ queries in one session — exactly
        # the service profile the cache registry exists for.  Release after
        # every query; results are already materialized (toPandas above),
        # so correctness is unaffected and the sweep doubles as a
        # continuous leak test.
        release_caches()
        # keep the checkpoint-RDD reclaim backlog small so the end-of-run
        # drain converges inside its budget; conditional on an actual
        # backlog so the forced-GC cost is only paid when needed (ADVICE
        # r8 — see tools/check_oracle.py)
        n_run += 1
        if n_run % 10 == 0 and jvm_cached_count(spark) > 8:
            gc_reclaim(spark, timeout_s=2.0)
    release_caches()
    # gate on NON-checkpoint persists only (the registry contract);
    # checkpoint RDDs linger on JVM GC timing — see tools/check_oracle.py
    gc_reclaim(spark, timeout_s=5.0)
    leaked = jvm_leaked_count(spark)
    if leaked:
        # explicit raise, not `assert`: python -O would strip the gate
        raise AssertionError(
            f"cache leak: {leaked} non-checkpoint persistent RDDs remain in "
            "the JVM after release_caches() — an operator persisted outside "
            "tracked_persist"
        )
    spark.stop()
    return hashes


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    a = _run_pass("A", sf_dir, only)
    b = _run_pass("B", sf_dir, only)
    failures = 0
    for name in a:
        if a[name] != b.get(name):
            failures += 1
            print(f"VARIES {name}: A={a[name][:16]} B={b.get(name, 'missing')[:16]}")
        else:
            print(f"ok     {name}")
    print(f"queries: {len(a)}  FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
