"""Trained-PQ scale probe: training cost must be FLAT in corpus size
(bounded n_train sample) while encode+ADC scales ~linearly — the design
claim of pq_train_codebooks / pq_topk_with_codebooks (round 6).

Synthetic corpus: `n` 64-dim vectors built as per-subspace prototype
concatenations (+noise) so the trained codebooks are meaningful; the
query set stays the fixed default (vec_id < 10) — at 100 TB the encode
pass is the only term that grows with the corpus, and it is one
broadcast-join scan (no shuffle of float vectors).

Usage: python tools/scale_probe_pq_trained.py [n]
Prints one JSON line per size (n/4 then n): train_s (eager Lloyd's),
query_s (encode + LUT + ADC + top-k), rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.similarity import (
    EMB_DIM,
    N_PQ_CENTROIDS,
    N_PQ_SUB,
    PQ_SUB_DIM,
    pq_topk_with_codebooks,
    pq_train_codebooks,
)
from dask_mwu_spark.session import get_spark


def synth_emb(spark, n: int):
    """Prototype-concatenation vectors, fully distributed construction:
    subspace s of vector i uses prototype hash(i, s) % 16, prototype
    values from the module LCG convention (cheap plan literals)."""
    from dask_mwu_spark.operators.similarity import pq_codebook

    protos = [
        [pq_codebook(s, c) for c in range(N_PQ_CENTROIDS)]
        for s in range(N_PQ_SUB)
    ]
    sub_arrays = []
    for s in range(N_PQ_SUB):
        choice = F.pmod(F.xxhash64(F.col("id"), F.lit(s)), F.lit(N_PQ_CENTROIDS))
        arms = F.array(
            *[
                F.array(*[F.lit(float(x) * 10.0) for x in protos[s][c]])
                for c in range(N_PQ_CENTROIDS)
            ]
        )
        sub_arrays.append(F.element_at(arms, (choice + 1).cast("int")))
    noise = F.transform(
        F.sequence(F.lit(1), F.lit(EMB_DIM)),
        lambda d: (
            F.pmod(F.xxhash64(F.col("id"), d, F.lit(99)), F.lit(1000)).cast(
                "double"
            )
            / 1e6
        ),
    )
    vec = F.zip_with(F.flatten(F.array(*sub_arrays)), noise, lambda a, b: a + b)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(vec, lambda x: x.cast("float")).alias("embedding"),
        F.lit(0).alias("label"),
    )


def probe(spark, n: int) -> dict:
    emb = synth_emb(spark, n).persist()
    emb.count()  # materialize the corpus outside the timings
    t0 = time.monotonic()
    cb = pq_train_codebooks(emb)  # eager (localCheckpoint per round)
    train_s = time.monotonic() - t0
    t0 = time.monotonic()
    rows = pq_topk_with_codebooks(emb, cb).count()
    query_s = time.monotonic() - t0
    emb.unpersist()
    return {
        "n_vectors": n,
        "train_s": round(train_s, 2),
        "query_s": round(query_s, 2),
        "topk_rows": rows,
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    spark = get_spark("pq-trained-probe")
    spark.sparkContext.setLogLevel("ERROR")
    small = probe(spark, n // 4)
    big = probe(spark, n)
    for r in (small, big):
        print(json.dumps(r))
    # training is sample-bounded: big-corpus training must not cost more
    # than ~2x the small one (same 256-vector sample, same tiny jobs)
    assert big["train_s"] <= small["train_s"] * 2 + 1.0, (small, big)


if __name__ == "__main__":
    main()
