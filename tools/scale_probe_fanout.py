"""Fan-out probe (VERDICT r1 #10): validate the documented load_table
``fan_out`` threshold on a single-row-group input actually in the size
regime where fan-out should WIN (>10M rows), not just at sf0.1 where it
documented-loses.

Parquet scan parallelism is bounded by row groups: a one-row-group file
pins the scan and every narrow op chained on it (melt, partial agg) to ONE
task.  ``fan_out=True`` inserts a round-robin repartition so the melt+agg
chain runs at full width, at the cost of shuffling the raw rows once.

The probe writes a one-row-group wide table (``parquet.block.size`` raised
above the file size), then times melt -> per-feature aggregation with
fan_out off vs on.  Scratch lives under the repo (.tmp/, gitignored).

Usage: python tools/scale_probe_fanout.py [n_rows] [n_value_cols]
Default 20,000,000 x 5 (100M long rows after melt).  One JSON line per
variant.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.session import get_spark
from dask_mwu_spark.sources.loaders import melt

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    "fanout_probe",
)


def write_single_row_group(spark, n_rows: int, n_cols: int) -> str:
    path = os.path.join(SCRATCH, f"wide_{n_rows}_{n_cols}.parquet")
    if os.path.exists(path):
        return path
    cols = [
        (F.pmod(F.xxhash64(F.col("id") + c), F.lit(1000)).cast("double") / 100.0).alias(
            f"f{c}"
        )
        for c in range(n_cols)
    ]
    (
        spark.range(n_rows)
        .select(F.col("id").alias("obs_id"), *cols)
        .coalesce(1)
        .write.option("parquet.block.size", 8 << 30)  # one row group
        .mode("overwrite")
        .parquet(path)
    )
    return path


def timed_agg(spark, path: str, n_cols: int, fan_out: bool, heavy: bool) -> float:
    df = spark.read.parquet(path)
    n_parts = df.rdd.getNumPartitions()
    if fan_out:
        # unconditional, mirroring load_table: the scan-partition count is
        # inflated by empty byte-range splits of the single row group
        df = df.repartition(spark.sparkContext.defaultParallelism)
    long = melt(df, ["obs_id"], [f"f{c}" for c in range(n_cols)])
    if heavy:
        # hashing-heavy narrow chain, the shape of the text/dedup operators
        # (md5 per cell) — downstream cost >> one row-shuffle
        cell = F.conv(
            F.substring(F.md5(F.concat_ws(":", "feature", "value")), 1, 15), 16, 10
        ).cast("decimal(20,0)")
        agg = long.groupBy("feature").agg(
            F.count(F.lit(1)).alias("n"), F.sum(cell).alias("s")
        )
    else:
        agg = long.groupBy("feature").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.avg("value").alias("m"),
        )
    t0 = time.time()
    agg.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "fanout_probe",
                "chain": "heavy" if heavy else "light",
                "fan_out": fan_out,
                "scan_partitions": n_parts,
                "value": round(dt, 3),
                "unit": "sec",
            }
        ),
        flush=True,
    )
    return dt


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_cols = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("fanout-probe")
    spark.sparkContext.setLogLevel("ERROR")
    path = write_single_row_group(spark, n_rows, n_cols)
    size_mb = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ) / (1 << 20)
    print(json.dumps({"n_rows": n_rows, "n_cols": n_cols, "file_mb": round(size_mb, 1)}))
    # warm page cache so all variants read warm
    timed_agg(spark, path, n_cols, fan_out=False, heavy=False)
    for heavy in (False, True):
        off = timed_agg(spark, path, n_cols, fan_out=False, heavy=heavy)
        on = timed_agg(spark, path, n_cols, fan_out=True, heavy=heavy)
        print(
            json.dumps(
                {
                    "metric": "fanout_speedup",
                    "chain": "heavy" if heavy else "light",
                    "value": round(off / on, 2),
                    "unit": "x",
                }
            )
        )
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
