"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
schema, and order-insensitive values.

Stricter than the driver: exact equality for non-rounded columns (if we pass
here bit-for-bit, any value-hash scheme matches).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py --smoke [sf_dir]

``--smoke`` (VERDICT r6 item 5) runs the 45-query family-representative
subset at sf0.001 by default — the cheap iteration gate (a few minutes)
for builders working on one operator family; the full battery at
sf0.01 + sf0.1 stays the round-close gate.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dask_mwu_spark import release_caches  # noqa: E402
from dask_mwu_spark.cache import (  # noqa: E402
    gc_reclaim,
    jvm_cached_count,
    jvm_leaked_count,
)
from dask_mwu_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Family-representative smoke tier: at least one query per operator family
# (MWU pipeline, rank machinery, dedup ladder, ANN ladder incl. trained,
# text battery, curation, streaming batch twins, graph, multimodal,
# lakehouse/CDC, OLAP shapes, statistics) — chosen to touch every module's
# hot path while finishing in a few minutes at sf0.001.
SMOKE = [
    # flagship MWU + rank machinery
    "wilcoxon_core", "mwu_full_rounded", "mwu_topk", "mwu_events_core",
    "mwu_rank_ties", "mwu_rank_data", "mwu_bh_adjust", "mwu_logfoldchange",
    # statistics
    "mwu_kruskal_wallis", "mwu_ks_test", "lineitem_chi2_assoc",
    "events_ab_test", "lineitem_return_wilson",
    # dedup ladder
    "dedup_exact", "dedup_minhash_lsh", "dedup_verified",
    "dedup_simhash_pairs", "dedup_components_fixed", "dedup_incremental",
    # ANN ladder (untrained + trained)
    "sim_cosine_topk", "sim_lsh_topk", "sim_ivf_topk", "sim_pq_topk",
    "sim_ivf_pq_trained_topk", "sim_ivf_trained_recall",
    "sim_semantic_dedup",
    # text battery (incl. the r8/r9 tokenizer family: learned BPE and
    # its corpus encode + the MaxMatch greedy segmenter)
    "text_quality", "text_token_count", "text_lang_id", "text_bm25_topk",
    "text_heavy_hitters", "text_bpe_encode", "text_maxmatch_segments",
    "text_unigram_segments", "text_hybrid_rrf", "text_bm25_batch",
    "text_unigram_encode",
    # curation
    "cur_curate", "cur_dsir_resample", "cur_bloom_decontaminate",
    "cur_group_split",
    # streaming batch twins
    "stream_windowed_agg", "stream_sessionize", "stream_drift_monitor",
    # graph + multimodal + lakehouse + OLAP
    "graph_pagerank", "graph_kcore", "mm_real_decode_stats",
    "orders_cdc_apply", "orders_scd2", "star_revenue_by_nation",
    "lineitem_bloom_semi",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(float)
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int", "UInt")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"row count {len(spark_df)} vs {len(duck_df)}")
        return problems
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype != bv.dtype:
            problems.append(f"dtype[{c}] {av.dtype} vs {bv.dtype}")
        if av.dtype.kind == "f":
            an, bn = av.to_numpy(), bv.to_numpy()
            both_nan = np.isnan(an) & np.isnan(bn)
            eq = (an == bn) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                idx = int(np.argmax(~eq))
                problems.append(
                    f"value[{c}]: {bad} mismatches, first at row {idx}: "
                    f"{an[idx]!r} vs {bn[idx]!r} (diff {abs(an[idx]-bn[idx]):.3e})"
                )
        else:
            if not (av == bv).all():
                bad = (av != bv).sum()
                idx = int(np.argmax((av != bv).to_numpy()))
                problems.append(
                    f"value[{c}]: {bad} mismatches, first at row {idx}: "
                    f"{av[idx]!r} vs {bv[idx]!r}"
                )
    return problems


def main() -> int:
    argv = sys.argv[1:]
    smoke = "--smoke" in argv
    if smoke:
        argv = [a for a in argv if a != "--smoke"]
    default_sf = "/root/testdata/sf0.001" if smoke else "/root/testdata/sf0.01"
    sf_dir = argv[0] if argv else default_sf
    only = set(argv[1:]) or (set(SMOKE) if smoke else set())
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # dogfood the long-lived-session cache contract (VERDICT r7 item
        # 8): drop the previous query's tracked persists before starting
        # the next — this harness runs the full 200+-query battery in one
        # session, the exact profile release_caches() exists for, so every
        # run doubles as a leak test (asserted against the JVM after the
        # loop).
        release_caches()
        # also drain the checkpoint-RDD reclaim path periodically: a full
        # 200+-query backlog left the END-OF-RUN drain 4 RDDs short of
        # converging inside its budget in one sf0.1 run (probe-verified:
        # per-query drains end at exactly 0), so keep the backlog small.
        # Conditional (ADVICE r8): the 2s forced-GC drain costs real
        # wall-clock over 206 queries, so it only fires when a backlog
        # has actually accumulated
        n_run += 1
        if n_run % 10 == 0 and jvm_cached_count(spark) > 8:
            gc_reclaim(spark, timeout_s=2.0)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: exact match ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    release_caches()
    # the leak gate asserts the REGISTRY contract: zero persistent RDDs
    # that are not localCheckpoint intermediates.  Checkpoint RDDs live
    # in Spark's weak-valued persistentRdds map and linger on JVM GC
    # timing (traced r8: 18-30s holds varying run to run — gating on
    # them was flaky); they are excluded via isLocallyCheckpointed, and
    # the short drain still bounds their block footprint
    gc_reclaim(spark, timeout_s=5.0)
    leaked = jvm_leaked_count(spark)
    if leaked:
        failures += 1
        print(
            f"FAIL cache-leak: {leaked} non-checkpoint persistent RDDs "
            "remain in the JVM after release_caches() — an operator "
            "persisted outside tracked_persist"
        )
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
