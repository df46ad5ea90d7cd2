"""Connected-components probe: adaptive convergence vs fixed-round mode.

The adaptive mode runs a driver-side count per round to detect
convergence — one job BARRIER per iteration, which at cluster scale means
a full scheduler round-trip between rounds.  The fixed-round mode
(``n_rounds=``) runs ceil(log2(diameter))+1 hop+pointer-jump rounds with
no counts.  This probe builds an adversarial LONG CHAIN (worst-case
diameter, the shape the counted mode was designed to be safe on) plus
disjoint star clusters (the realistic LSH shape) and times both modes,
asserting label-identical output.

Usage: python tools/scale_probe_components.py [chain_len] [n_stars]
Default 100,000-node chain + 10,000 8-node stars.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.dedup import dup_components
from dask_mwu_spark.session import get_spark


def main() -> None:
    chain_len = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_stars = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("scale-probe-components")
    spark.sparkContext.setLogLevel("ERROR")

    chain = spark.range(chain_len - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    star_base = 10_000_000
    hub = F.floor(F.col("id") / 7) * 8
    spoke = F.pmod(F.col("id"), F.lit(7)) + 1
    stars = spark.range(n_stars * 7).select(
        (F.lit(star_base) + hub).alias("doc_a"),
        (F.lit(star_base) + hub + spoke).alias("doc_b"),
    )
    pairs = chain.unionByName(stars).persist()
    pairs.count()

    out: dict[str, float | int] = {"chain_len": chain_len, "n_stars": n_stars}
    # hop+jump >=doubles distance per round: chain needs ~log2(len) rounds
    rounds = max(1, (chain_len - 1).bit_length()) + 1
    out["n_rounds"] = rounds

    t0 = time.time()
    fixed = dup_components(pairs, n_rounds=rounds)
    n_fixed = fixed.groupBy("component").count().count()
    out["fixed_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    adaptive = dup_components(pairs, max_iter=rounds + 5)
    n_adaptive = adaptive.groupBy("component").count().count()
    out["adaptive_sec"] = round(time.time() - t0, 2)

    out["n_components"] = n_adaptive
    assert n_fixed == n_adaptive == 1 + n_stars, (n_fixed, n_adaptive)
    mismatch = (
        fixed.alias("f")
        .join(adaptive.alias("a"), "doc_id")
        .where(F.col("f.component") != F.col("a.component"))
        .count()
    )
    assert mismatch == 0, mismatch
    out["labels_identical"] = True
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
