"""Round-5 operator scale probe: Gopher rule battery, DSIR importance
weights, fuzzy (MinHash-LSH) decontamination, Matryoshka recall.

What each probe is meant to show:
- gopher_rules: pure per-row expression work (zero shuffle) — time is one
  corpus scan; run at n/4 and n, ratio ~4x, and the per-doc cost is
  independent of corpus size.
- dsir_weights: one bigram explode + ONE doc-keyed shuffle (the persisted
  doc-bucket table feeds both the raw distribution and the per-doc fold),
  plus two <=B-row broadcast distributions; time ~linear in corpus
  tokens.  Fold state per doc <= B = 256 entries regardless of doc count.
- fuzzy_contamination: ONE corpus signature pass (persisted) + a
  broadcast band join against the eval side; with a fixed eval set, time
  grows ~linearly in the train corpus, NOT in train x eval.
- matryoshka_recall: per prefix, one corpus scan against the bounded
  broadcast query set — linear in corpus x n_prefixes.

Usage: python tools/scale_probe_r5.py [n_docs] [n_vecs]
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import curation as cur
from dask_mwu_spark.operators import similarity as sim
from dask_mwu_spark.operators import text as tx
from dask_mwu_spark.session import get_spark
from tools.scale_probe_curation import synth_docs


def timed(name, df, extra=None):
    runs = []
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 2))
    rec = {
        "metric": f"r5_probe_{name}",
        "value": runs[-1],
        "cold": runs[0],
        "unit": "sec",
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def synth_vecs(spark, n_vecs: int, dim: int = 64):
    comps = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id") * 100 + i.cast("long")), F.lit(2001))
            - 1000
        ).cast("float")
        / 1000.0,
    )
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        comps.alias("embedding"),
        F.lit(0).alias("label"),
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark("scale-probe-r5")
    spark.sparkContext.setLogLevel("ERROR")

    for n in (n_docs // 4, n_docs):
        docs = synth_docs(spark, n)
        timed(f"gopher_rules_{n}", tx.gopher_rules(docs), {"n_docs": n})

    for n in (n_docs // 4, n_docs):
        docs = synth_docs(spark, n)
        raw = docs.where(F.col("doc_id") % 50 != 0)
        tgt = docs.where(F.col("doc_id") % 50 == 0)
        timed(f"dsir_weights_{n}", cur.dsir_weights(raw, tgt), {"n_docs": n})

    # fuzzy decontamination: FIXED eval set (n_docs//200 docs), growing
    # train corpus — the production shape.  Clamp so the n/4 probe corpus
    # still has a non-empty train side for small CLI n_docs.
    eval_n = min(max(1000, n_docs // 200), n_docs // 8)
    for n in (n_docs // 4, n_docs):
        docs = synth_docs(spark, n)
        raw = docs.where(F.col("doc_id") >= eval_n)
        tgt = docs.where(F.col("doc_id") < eval_n)
        timed(
            f"fuzzy_contamination_{n}",
            cur.fuzzy_contamination(raw, tgt, est_threshold=0.25),
            {"n_train": n - eval_n, "n_eval": eval_n},
        )

    for n in (n_vecs // 4, n_vecs):
        emb = synth_vecs(spark, n)
        timed(
            f"matryoshka_recall_{n}",
            sim.matryoshka_recall(emb, n_queries=10, k=5),
            {"n_vecs": n},
        )

    spark.stop()


if __name__ == "__main__":
    main()
