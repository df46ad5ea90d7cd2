"""Round-4b operator scale probe: source entropy, sorted-neighborhood
blocking, tf-idf cosine pairs, rolling distinct users, PSI drift.

What each probe is meant to show:
- source_entropy: explode -> (source, word) groupBy -> two bucketed folds;
  time ~linear in corpus tokens (run at n/4 and n, ratio ~4x), and the
  two-level fold costs the same at n_buckets=16 vs 1024 (bounded state is
  free).
- sorted_neighborhood_pairs: the two-phase prefix-bucket global rank on
  1M docs — no global window sort anywhere; wall dominated by the
  per-bucket sorts, which parallelize across the prefix alphabet.
- tfidf_cosine_pairs: the df cap bounds the inverted-index fanout; probe
  reports wall + surviving pair count at max_df=50 on a corpus where the
  UNCAPPED join would be ~(n_docs/|shingle space|)^2-per-shingle quadratic.
- rolling_distinct_users: contribution expansion = distinct (user, day)
  shrink THEN x7 explode; 20M events with 100k users x 30 days collapse
  to <= 3M rows before any fanout.
- psi_drift: two independent scans + an n_bins-row join — the probe just
  documents it is scan-bound.

Usage: python tools/scale_probe_r4b.py [n_docs] [n_events]
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import audit as au
from dask_mwu_spark.operators import dedup as dd
from dask_mwu_spark.operators import events as ev
from dask_mwu_spark.operators import text as tx
from dask_mwu_spark.session import get_spark
from tools.scale_probe_curation import synth_docs

NS_PER_DAY = 86_400_000_000_000


def timed(name, df, extra=None):
    runs = []
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 2))
    rec = {"metric": f"r4b_probe_{name}", "value": runs[-1], "cold": runs[0],
           "unit": "sec"}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def synth_events(spark, n_events: int):
    """100k users, 30 days, 5 types; ts jitter inside the day."""
    h = F.xxhash64("id")
    return spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.pmod(h, F.lit(100_000)).alias("user_id"),
        (
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(30)) * NS_PER_DAY
            + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(NS_PER_DAY))
        ).alias("ts"),
        F.concat(F.lit("t"), F.pmod(h, F.lit(5))).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)) / 10.0).alias("value"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    spark = get_spark("r4b-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for n in (n_docs // 4, n_docs):
        docs = synth_docs(spark, n).persist()
        docs.count()
        tag = f"{n // 1000}k"
        timed(f"source_entropy_{tag}", tx.source_entropy(docs, n_buckets=256))
        docs.unpersist()

    docs = synth_docs(spark, n_docs).persist()
    docs.count()
    tag = f"{n_docs // 1000}k"
    for nb in (16, 1024):
        timed(
            f"source_entropy_buckets{nb}_{tag}",
            tx.source_entropy(docs, n_buckets=nb),
            extra={"n_buckets": nb},
        )
    timed(f"snm_{tag}", dd.sorted_neighborhood_pairs(docs, window=3))
    docs.unpersist()

    tdocs = synth_docs(spark, n_docs // 4).persist()
    tdocs.count()
    pairs = dd.tfidf_cosine_pairs(tdocs, n=3, threshold=0.5, max_df=50)
    t0 = time.time()
    n_pairs = pairs.count()
    print(json.dumps({
        "metric": f"r4b_probe_tfidf_cosine_{n_docs // 4000}k",
        "value": round(time.time() - t0, 2), "unit": "sec",
        "max_df": 50, "n_pairs": n_pairs,
    }), flush=True)
    tdocs.unpersist()

    evs = synth_events(spark, n_events).persist()
    evs.count()
    etag = f"{n_events // 1_000_000}m"
    timed(f"rolling_dau_{etag}", ev.rolling_distinct_users(evs, window_days=7))
    timed(
        f"psi_drift_{etag}",
        au.psi_drift(
            evs.where(F.col("event_id") % 2 == 0),
            evs.where(F.col("event_id") % 2 == 1),
            "value",
            breaks=[10.0, 25.0, 50.0, 75.0, 90.0],
        ),
    )
    evs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
