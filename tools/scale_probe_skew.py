"""Skewed-join scale probe: measure salted_join vs the plain shuffle join
on a fact table where ONE hot key owns 50% of the rows (VERDICT r1 #9).

Setup mirrors the scenario the operator exists for (operators/skew.py): the
dimension side is too large to broadcast (we set autoBroadcastJoinThreshold
to -1 to simulate that without generating gigabytes), and the join shape is
one AQE's skew splitting cannot always rescue — we measure three variants:

  1. plain join, AQE skew-join ON   (what you get for free today)
  2. plain join, AQE skew-join OFF  (the shapes AQE cannot split —
     aggregation hot keys, non-sort-merge joins)
  3. salted_join (n_salts=16), AQE skew-join OFF

plus two_phase_agg vs a plain groupBy over the same hot key.  Every variant
is validated to produce the same row count before timing.  Results go to
BASELINE.md.

Usage: python tools/scale_probe_skew.py [n_rows] [n_keys]
Default 20,000,000 rows x 1,000 keys, key 0 = 50% of rows.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.skew import salted_join, two_phase_agg
from dask_mwu_spark.session import get_spark


def synth(spark, n_rows: int, n_keys: int):
    """Fact table: first half all key 0 (the hot key), second half uniform
    over the remaining keys.  Dimension: one row per key."""
    fact = spark.range(n_rows).select(
        F.when(F.col("id") < n_rows // 2, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys - 1)) + 1)
        .alias("key"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("key"), F.concat(F.lit("k"), F.col("id")).alias("label")
    )
    return fact, dim


def timed_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # simulate a broadcast-ineligible dimension without generating GBs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact, dim = synth(spark, n_rows, n_keys)
    fact = fact.persist()
    dim = dim.persist()
    fact.count(), dim.count()  # materialize inputs outside the timings

    plain = fact.join(dim, on=["key"])
    salted = salted_join(fact, dim, on=["key"], n_salts=16)
    assert plain.count() == salted.count() == n_rows

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_plain_aqe = timed_noop(plain)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_plain_noaqe = timed_noop(plain)
    t_salted = timed_noop(salted)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    agg_plain = fact.groupBy("key").agg(
        F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("count_value")
    )
    agg_two = two_phase_agg(fact, ["key"], {"value": "sum"}, n_salts=16)
    assert agg_plain.count() == agg_two.count() == n_keys
    t_agg_plain = timed_noop(agg_plain)
    t_agg_two = timed_noop(agg_two)

    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_keys": n_keys,
                "hot_key_share": 0.5,
                "plain_join_aqe_skew_sec": t_plain_aqe,
                "plain_join_noaqe_sec": t_plain_noaqe,
                "salted_join_sec": t_salted,
                "groupby_plain_sec": t_agg_plain,
                "two_phase_agg_sec": t_agg_two,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
