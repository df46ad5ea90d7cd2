"""Cache-leak probe: JVM cached-block growth across repeated operator
invocations in one long-lived session, with vs without
``release_caches()`` (the ADVICE-r6 tracked-persist fix).

The production claim under test: a service/notebook that calls a
persisting operator (IVF top-k here) N times per day must not
accumulate N posting-list caches — with the registry, calling
``dask_mwu_spark.release_caches()`` after materializing each result
holds the JVM persistent-RDD count FLAT, while the pre-fix behavior
(never releasing) grows it linearly until executor storage memory
evicts useful blocks or OOMs at 100 TB block sizes.

Run: python tools/scale_probe_cache.py [n_invocations]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_mwu_spark import release_caches
from dask_mwu_spark.cache import jvm_cached_count as jvm_cached
from dask_mwu_spark.operators.similarity import ivf_topk
from dask_mwu_spark.session import get_spark
from dask_mwu_spark.sources.loaders import load_table


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("cache-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")

    # Each invocation sees a DIFFERENT input (a service re-runs the
    # operator on each day's corpus slice, not the identical plan —
    # Spark's CacheManager dedupes persists of an IDENTICAL logical
    # plan, so same-plan repeats don't leak; distinct plans each add a
    # cache entry, and that is the real long-session profile).
    def corpus(i: int):
        return emb.limit(200 + i)

    # arm 1: the leak (call, materialize, never release)
    release_caches()
    leak_counts = []
    for i in range(n):
        ivf_topk(corpus(i), n_queries=4, k=3).count()
        leak_counts.append(jvm_cached(spark))

    # arm 2: the fix (release after each materialized result)
    release_caches()
    fixed_counts = []
    for i in range(n):
        ivf_topk(corpus(i), n_queries=4, k=3).count()
        release_caches()
        fixed_counts.append(jvm_cached(spark))

    print(f"invocations: {n}")
    print(f"without release_caches(): cached RDDs per call = {leak_counts}")
    print(f"with    release_caches(): cached RDDs per call = {fixed_counts}")
    grows = leak_counts[-1] > leak_counts[0]
    flat = len(set(fixed_counts)) == 1
    print(f"leak arm grows: {grows}; fixed arm flat: {flat}")
    spark.stop()


if __name__ == "__main__":
    main()
