"""Round-5b operator scale probe: dominant-PC power iteration, bloom
decontamination, TextRank, label-centroid audit, basket lift.

What each probe is meant to show (run at n/4 and n — near-linear ratios
back the docstring scale contracts):
- dominant_pc / anisotropy: per round, one dot scan + one vec-keyed
  product shuffle; reduction state bounded by d x n_buckets, so time is
  ~linear in n_vecs x d x n_iter and NEVER materializes d x d.
- bloom_decontaminate: with a FIXED eval set, the bit table is constant
  size; train-side cost is one shingle scan + k broadcast bit-word joins
  -> ~linear in train tokens (the broadcast-shingles alternative would
  grow with the eval side instead).
- textrank_keywords: the word co-occurrence edge set saturates at the
  vocabulary (synthetic vocab is fixed), so the pagerank phase is
  ~CONSTANT in corpus size; only the bigram counting scan grows.
- label_centroid_outliers: centroid build = bounded (label, dim, bucket)
  folds; scoring = broadcast-centroid row work -> ~linear.
- basket_lift: pair fanout bounded by per-order distinct brands; the
  groupBy keys on a vocab^2 ceiling -> ~linear in lineitem rows.

Usage: python tools/scale_probe_r5b.py [n_docs] [n_vecs]
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import affinity as af
from dask_mwu_spark.operators import curation as cur
from dask_mwu_spark.operators import similarity as sim
from dask_mwu_spark.operators import text as tx
from dask_mwu_spark.session import get_spark
from tools.scale_probe_curation import synth_docs
from tools.scale_probe_r5 import synth_vecs, timed


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("scale-probe-r5b")
    spark.sparkContext.setLogLevel("ERROR")

    for n in (n_vecs // 4, n_vecs):
        vecs = synth_vecs(spark, n).withColumn(
            "label", F.pmod(F.col("vec_id"), F.lit(10)).cast("int")
        )
        # dominant_pc runs its per-round localCheckpoints EAGERLY during
        # construction, so time the call + action together
        runs = []
        for _ in range(2):
            t0 = time.time()
            sim.dominant_pc(vecs).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 2))
        print(
            json.dumps(
                {
                    "metric": f"r5_probe_dominant_pc_n{n}",
                    "value": runs[-1],
                    "cold": runs[0],
                    "unit": "sec",
                    "n_vecs": n,
                }
            ),
            flush=True,
        )
        timed(
            f"label_outliers_n{n}",
            sim.label_centroid_outliers(vecs),
            {"n_vecs": n},
        )

    for n in (n_docs // 4, n_docs):
        docs = synth_docs(spark, n)
        ev = docs.where(F.col("doc_id") % 50 == 0)
        tr = docs.where(F.col("doc_id") % 50 != 0)
        timed(
            f"bloom_decontaminate_n{n}",
            cur.bloom_decontaminate(tr, ev).groupBy("source").count(),
            {"n_docs": n},
        )
        timed(f"textrank_n{n}", tx.textrank_keywords(docs), {"n_docs": n})

    # basket lift on a synthetic order/brand table
    for n in (n_docs // 4, n_docs):
        li = spark.range(n).select(
            (F.col("id") / 4).cast("long").alias("l_orderkey"),
            F.pmod(F.xxhash64("id"), F.lit(200)).alias("l_partkey"),
        )
        pt = spark.range(200).select(
            F.col("id").alias("p_partkey"),
            F.concat(F.lit("B"), F.pmod(F.col("id"), F.lit(25))).alias(
                "p_brand"
            ),
        )
        timed(f"basket_lift_n{n}", af.basket_lift(li, pt), {"n_rows": n})


if __name__ == "__main__":
    main()
