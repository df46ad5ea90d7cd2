"""ANN-at-scale probe: brute-force vs LSH vs IVF cosine top-k over a
synthetic embedding table far beyond the bench corpus, generated JVM-side.

Vectors are deterministic pseudo-random 64-dim floats drawn as
cluster-center + 10% noise (xxhash64-seeded, ``n_clusters`` centers) —
clustered like real embedding spaces. Uniform random vectors would be
adversarial for any locality structure: nearest neighbors at ~zero cosine
carry no signal for LSH buckets (measured 3% LSH recall on uniform data),
which says something about uniform noise, not about the index.
Reports per-path seconds and LSH/IVF recall against the brute-force top-k.

Usage: python tools/scale_probe_ann.py [n_vectors] [n_clusters]
Default 100,000 x 500 (50x the bench embeddings table). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import similarity as sim
from dask_mwu_spark.session import get_spark

DIM = 64


def synth_embeddings(spark, n: int, n_clusters: int):
    cluster = F.pmod(F.col("id"), F.lit(n_clusters))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            # cluster center in [-0.5, 0.5) ...
            F.pmod(F.xxhash64(cluster, d), F.lit(100_000)).cast("double") / 100_000.0
            - 0.5
            # ... plus 10%-amplitude per-vector noise
            + (
                F.pmod(F.xxhash64(F.col("id"), d + DIM), F.lit(100_000)).cast("double")
                / 100_000.0
                - 0.5
            )
            * 0.1
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"), F.lit(0).alias("label")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark("scale-probe-ann")
    spark.sparkContext.setLogLevel("ERROR")
    emb = synth_embeddings(spark, n, n_clusters).persist()
    emb.count()

    out: dict[str, float | int] = {
        "n_vectors": n,
        "dim": DIM,
        "n_clusters": n_clusters,
    }
    t0 = time.time()
    exact = {
        (r.q_id, r.vec_id) for r in sim.cosine_topk(emb, n_queries=10, k=10).collect()
    }
    out["brute_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    lsh = {
        (r.q_id, r.vec_id)
        for r in sim.lsh_cosine_topk(emb, n_queries=10, k=10).collect()
    }
    out["lsh_sec"] = round(time.time() - t0, 2)
    out["lsh_recall"] = round(len(lsh & exact) / len(exact), 3)
    t0 = time.time()
    ivf = {
        (r.q_id, r.vec_id)
        for r in sim.ivf_topk(
            emb, n_centroids=64, n_probe=8, n_queries=10, k=10
        ).collect()
    }
    out["ivf_sec"] = round(time.time() - t0, 2)
    out["ivf_recall"] = round(len(ivf & exact) / len(exact), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
