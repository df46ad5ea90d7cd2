"""Dedup-at-scale probe: drive the near-dup operators over a synthetic
corpus 10-40x the bench documents table, generated JVM-side.

Docs are deterministic word sequences from a small vocabulary (tie-dense
shingles — the hard case for the df-cap and band buckets), with every 10th
document a near-duplicate of its predecessor (one word changed) so the
pair-finding paths have real work to do.

Usage: python tools/scale_probe_dedup.py [n_docs] [words_per_doc]
Default 50,000 x 60. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import dedup as dd
from dask_mwu_spark.session import get_spark

VOCAB = 500


def synth_docs(spark, n_docs: int, words_per_doc: int):
    """(doc_id, text): deterministic pseudo-random word docs; doc 10k+1
    duplicates doc 10k except its last word (a guaranteed near-dup pair)."""
    base = F.col("base_id")
    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(base, j), F.lit(VOCAB))
        ),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        # near-dup every 10th: reuse predecessor's base, perturb via the
        # last word below
        F.when(F.col("id") % 10 == 1, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("base_id"),
    )
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 1,
            F.concat_ws(" ", F.slice(words, 1, words_per_doc - 1), F.lit("wX")),
        )
        .otherwise(F.concat_ws(" ", words))
        .alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    wpd = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark("scale-probe-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n_docs, wpd).persist()
    docs.count()  # materialize the corpus outside the timings

    out: dict[str, float | int] = {"n_docs": n_docs, "words_per_doc": wpd}
    t0 = time.time()
    out["exact_groups"] = dd.exact_dup_groups(docs).count()
    out["exact_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["lsh_pairs"] = dd.minhash_lsh_pairs(docs, est_threshold=0.5).count()
    out["lsh_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["simhash_pairs"] = dd.simhash_pairs(docs, max_hamming=3).count()
    out["simhash_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
