"""Exact-quantile-at-scale probe: single-buffer percentile vs histogram
narrowing.

``F.percentile`` is exact but accumulates a per-distinct-value hash map in
ONE aggregation buffer — state grows with cardinality, which is what dies
at 1e11 docs.  ``audit.exact_quantile`` narrows with n_bins-bounded
histogram passes and recounts values only inside the final candidate
window, so per-node state is O(n_bins) regardless of input size.  This
probe generates n high-cardinality doubles (plus a 20% tie mass at one
value, the adversarial shape for narrowing), checks both paths produce the
IDENTICAL double, and reports wall seconds.

Usage: python tools/scale_probe_quantile.py [n] [q]
Default 50,000,000 x 0.5.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.audit import exact_quantile
from dask_mwu_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    q = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark("scale-probe-quantile")
    spark.sparkContext.setLogLevel("ERROR")
    # 80% high-cardinality lognormal-ish positives, 20% exact ties at 1.0
    df = spark.range(n).select(
        F.when(F.pmod(F.col("id"), F.lit(5)) == 0, F.lit(1.0))
        .otherwise(
            F.exp(
                (
                    F.pmod(F.xxhash64("id"), F.lit(1_000_003)).cast("double")
                    / 1_000_003.0
                    - 0.5
                )
                * 10.0
            )
        )
        .alias("v")
    ).persist()
    df.count()

    out: dict[str, float | int] = {"n": n, "q": q}
    t0 = time.time()
    agg = df.agg(F.percentile("v", F.lit(q))).first()[0]
    out["percentile_agg_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    hist = exact_quantile(df, "v", q)
    out["histogram_sec"] = round(time.time() - t0, 2)
    out["identical"] = agg == hist
    out["value"] = hist
    assert out["identical"], (agg, hist)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
