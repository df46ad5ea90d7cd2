"""SemDeDup mega-cluster probe: what happens when clustering collapses.

The published SemDeDup recipe pairs vectors within their k-means cluster —
O(sum n_c^2).  On boilerplate-dominated corpora one centroid can absorb a
large corpus fraction, turning that into a quadratic hot spot that AQE
cannot fix (it splits the shuffle read, not the pair count).  This probe
plants a mega-cluster (``mega_frac`` of all vectors on one centroid, the
rest spread evenly) and measures ``semantic_dup_pairs`` uncapped vs with
``max_cluster_size``: pair counts, wall seconds, and the count ratio.

Usage: python tools/scale_probe_semdedup.py [n_vectors] [mega_frac] [cap]
Default 20,000 x 0.30 x 500.  Prints one JSON line.
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

DIM = 16
N_CENTROIDS = 8


def synth_embeddings(spark, n: int, mega_frac: float):
    """First ``mega_frac`` of ids point along dim 0 (one cluster); the rest
    rotate through dims 1..N_CENTROIDS-1.  Assigned against orthogonal
    injected centroids, cluster membership is exact by construction."""
    dominant = F.when(
        F.col("id") < int(n * mega_frac), F.lit(0)
    ).otherwise(F.pmod(F.col("id"), F.lit(N_CENTROIDS - 1)) + 1)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            F.when(d == dominant, F.lit(1.0)).otherwise(F.lit(0.0))
            + (
                F.pmod(F.xxhash64(F.col("id"), d), F.lit(100_000)).cast("double")
                / 100_000.0
                - 0.5
            )
            * 0.02
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"), F.lit(0).alias("label")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mega_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.30
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    spark = get_spark("scale-probe-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    emb = synth_embeddings(spark, n, mega_frac).persist()
    emb.count()
    cents = spark.createDataFrame(
        [
            (i, [1.0 if d == i else 0.0 for d in range(DIM)])
            for i in range(N_CENTROIDS)
        ],
        "cent_id: long, embedding: array<double>",
    )

    out: dict[str, float | int] = {
        "n_vectors": n,
        "mega_frac": mega_frac,
        "cap": cap,
    }
    t0 = time.time()
    out["uncapped_pairs"] = sim.semantic_dup_pairs(
        emb, tau=-1.0, centroids=cents
    ).count()
    out["uncapped_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["capped_pairs"] = sim.semantic_dup_pairs(
        emb, tau=-1.0, centroids=cents, max_cluster_size=cap
    ).count()
    out["capped_sec"] = round(time.time() - t0, 2)
    out["pair_ratio"] = round(out["capped_pairs"] / out["uncapped_pairs"], 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
