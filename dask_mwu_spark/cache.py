"""Session-lifetime cache tracking for lazily persisted intermediates.

Several operators persist an expensive intermediate (IVF posting lists,
MinHash signature tables, LSH buckets, canonical edge lists) because the
returned plan branches over it or re-derives it across self-joins.  The
returned DataFrames are LAZY, so the operator cannot unpersist before the
caller materializes — an eager ``finally: unpersist()`` (the
exact-quantile fix, ``audit.py:824``) only works where the operator
itself materializes via ``localCheckpoint``.

This module is the shared fix (ADVICE r6, ``similarity.py:1372``): every
lazy persist in the package goes through :func:`tracked_persist`, which
records the DataFrame in a session-lifetime registry, and long-lived
sessions call :func:`release_caches` after materializing results to drop
every cached block in one call.  Unpersisting does NOT invalidate
already-returned plans — Spark keeps the lineage, so a later action
simply recomputes instead of reading cache.

Caching contract (documented here once, referenced from operator
docstrings): each call to a persisting operator caches its intermediate
for the session lifetime; batch jobs that end with the session need do
nothing, while long-lived sessions (notebooks, services) should call
``dask_mwu_spark.release_caches()`` between logical units of work.

Leak profile (measured, ``tools/scale_probe_cache.py``): Spark's
CacheManager dedupes persists of an IDENTICAL logical plan, so
repeating the same call never leaked; the per-invocation leak is real
exactly when each call sees different data (a service processing daily
slices) — there the JVM persistent-RDD count grows linearly without
release and stays flat with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Strong refs by design: the registry IS the owner of the cached blocks
# until release_caches() drops them (a weak registry would silently lose
# track of blocks whose Python handle was GC'd while the JVM cache lives
# on — the exact leak this module exists to close).
_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """``df.persist(level)`` plus registration in the session-lifetime
    registry so :func:`release_caches` can drop the blocks later."""
    out = df.persist(level)
    _TRACKED.append(out)
    return out


def release_caches() -> int:
    """Unpersist every intermediate the package has persisted via
    :func:`tracked_persist` and empty the registry.  Returns the number
    of DataFrames released.  Safe to call at any time: plans already
    returned by operators stay valid (lineage recomputes on the next
    action instead of hitting cache); DataFrames whose SparkSession has
    stopped are skipped silently.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped session / torn-down JVM makes unpersist throw;
            # the blocks are gone with the executor anyway
            pass
    return n


def tracked_count() -> int:
    """Number of currently tracked (persisted, unreleased) DataFrames."""
    return len(_TRACKED)


def gc_reclaim(spark, *, timeout_s: float = 30.0) -> int:
    """Drive the ASYNC reclaim path for checkpoint intermediates, then
    return the JVM persistent-RDD count (0 = fully reclaimed).

    ``localCheckpoint()`` intermediates (the pagerank/k-core/BPE
    fixed-round discipline) are persisted RDDs too, but with the OPPOSITE
    lifetime contract from :func:`tracked_persist`: their lineage is
    truncated, so an explicit ``unpersist`` would break any plan still
    referencing them — they are instead reclaimed by Spark's
    ContextCleaner once the JVM Dataset becomes unreachable (Python GC →
    py4j detach → JVM weak-ref → async unpersist).  A leak gate that
    counts persistent RDDs immediately after ``release_caches()``
    therefore false-positives on whatever checkpoint RDDs the cleaner
    has not visited yet (it fired round-8 on an ISOLATED
    ``graph_pagerank`` run — the full-battery runs passed only because
    later queries gave the cleaner time).  This helper makes the gate
    deterministic: force a Python collect + JVM ``System.gc()`` and poll
    until the count reaches 0 or ``timeout_s`` elapses; anything still
    alive after that IS a genuine leak (a strong reference someone
    forgot to track)."""
    import gc
    import time

    jvm = spark.sparkContext._jvm
    start = time.time()
    deadline = start + timeout_s
    prev, last_change = -1, start
    while True:
        gc.collect()
        jvm.System.gc()
        # weak refs enqueue at the GC that clears the referent; the
        # finalization pass plus a second GC catches referents that only
        # became unreachable DURING the first cycle (py4j detach landing
        # between the collect and the gc)
        jvm.System.runFinalization()
        jvm.System.gc()
        n = jvm_cached_count(spark)
        now = time.time()
        if n != prev:
            prev, last_change = n, now
        # early exit on a TIME-stable count (review r8, recalibrated):
        # a just-released reference measurably stays JVM-reachable for
        # ~18s regardless of GC pressure (traced: count pinned through
        # 35 gc+finalize cycles, then clears in 2 cycles — a py4j-side
        # release batch, not GC latency), so cycle-count stability is
        # meaningless; a count unchanged for 22s IS the floor (strongly
        # referenced, e.g. a caller's legitimate persist) and hammering
        # full GCs for the rest of a longer budget cannot lower it.
        # Capped at timeout_s (ADVICE r8): for short-timeout callers
        # (the harnesses' 2s/5s periodic drains) the 22s window could
        # never fire before the deadline — those calls are bounded
        # best-effort drains by contract, and the cap makes the code say
        # so instead of carrying a dead branch
        if n == 0 or now - last_change >= min(22.0, timeout_s) or now >= deadline:
            return n
        time.sleep(0.5 if now - start < 3 else 1.0)


def jvm_cached_count(spark) -> int:
    """Number of persisted RDDs the JVM currently tracks — the ground
    truth the registry is audited against (tests/test_r7_ops.py,
    tools/scale_probe_cache.py).  Uses a private py4j path
    (``_jsc.sc().getPersistentRDDs()``); kept here as the single source
    of truth so a Spark-internal rename is a one-line fix."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def jvm_leaked_count(spark) -> int:
    """Persistent RDDs that are NOT localCheckpoint intermediates — the
    quantity the harness leak gates assert to zero.

    The distinction is the two lifetime contracts: a non-checkpoint
    persist surviving ``release_caches()`` means an operator persisted
    OUTSIDE ``tracked_persist`` — a real registry leak.  A
    ``localCheckpoint`` RDD, by contrast, lives in Spark's WEAK-VALUED
    ``persistentRdds`` map and lingers only until the JVM collects the
    Dataset that references it — traced round 8: the count can stay
    pinned for 18-30s under explicit-GC hammering and then drop all at
    once, timing that varies run to run (py4j detach batching + JVM GC
    scheduling).  Gating on it made the battery gates flaky; gating on
    the non-checkpoint count tests the actual contract and is
    deterministic.  (Checkpoint blocks are still reclaimed: the
    ContextCleaner unpersists them as the JVM GCs, and gc_reclaim
    accelerates that for tests that need the full drain.)

    Acknowledged trade-off (review r8): a checkpointed DataFrame held
    STRONGLY forever (e.g. a module-global) would pin its blocks and be
    invisible to this gate.  That pattern does not exist in the package
    (operators hold no module-level DataFrame state — grep-audited) and
    is kept out by review; the alternative (counting checkpoints) was
    demonstrably flaky on GC timing, which is worse than the narrowed
    scope."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    n = 0
    while it.hasNext():
        if not it.next()._2().isLocallyCheckpointed():
            n += 1
    return n
