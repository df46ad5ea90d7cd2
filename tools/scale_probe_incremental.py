"""Incremental-dedup probe: cost of deduping a FIXED batch against a
growing historical corpus, with the history as (a) a persisted band-index
parquet table vs (b) recomputed from raw history docs each run.

The production claim under test: once the LSH band index is materialized,
a daily increment costs O(batch shingling) + O(index scan) — the index
scan is a 3-column columnar read, orders cheaper than re-shingling and
re-minhashing the corpus, and the gap widens linearly with corpus size.

Run: python tools/scale_probe_incremental.py [batch_docs] [index_sizes...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.dedup import incremental_dedup_flags, minhash_band_keys
from dask_mwu_spark.session import get_spark


def make_docs(spark, n: int, *, offset: int = 0, dup_every: int = 10):
    """Synthetic docs: ~9 words each, every dup_every-th doc repeats doc 0's
    template (planted cross-batch duplicates)."""
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % dup_every == 0,
            F.lit("the shared template text that repeats across batches verbatim"),
        )
        .otherwise(
            F.concat(
                F.lit("unique document body "),
                F.col("id").cast("string"),
                F.lit(" with words "),
                (F.col("id") * 7 % 1000).cast("string"),
                F.lit(" "),
                (F.col("id") * 13 % 1000).cast("string"),
                F.lit(" tail"),
            )
        )
        .alias("text"),
    ).repartition(spark.sparkContext.defaultParallelism)


def main() -> None:
    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    sizes = [int(x) for x in sys.argv[2:]] or [100_000, 400_000]
    spark = get_spark("incr-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="incr_probe_")
    batch = make_docs(spark, batch_n, offset=10_000_000).persist()
    batch.count()
    print(f"batch = {batch_n:,} docs; work dir {work}")
    for n in sizes:
        hist = make_docs(spark, n)
        idx_path = os.path.join(work, f"index_{n}")
        t0 = time.time()
        minhash_band_keys(hist).write.mode("overwrite").parquet(idx_path)
        t_build = time.time() - t0

        idx = spark.read.parquet(idx_path)
        t0 = time.time()
        kept = (
            incremental_dedup_flags(batch, idx)
            .where(F.col("keep"))
            .count()
        )
        t_indexed = time.time() - t0

        t0 = time.time()
        incremental_dedup_flags(batch, minhash_band_keys(hist)).where(
            F.col("keep")
        ).count()
        t_recompute = time.time() - t0
        print(
            f"index {n:>9,} docs | build {t_build:5.1f}s | "
            f"batch-vs-INDEX {t_indexed:5.1f}s | batch-vs-RECOMPUTE "
            f"{t_recompute:5.1f}s | kept {kept:,}"
        )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
