"""Curation-operator scale probe: run the training-data curation stages on
a synthetic corpus ~100x the sf0.1 bench (1M docs, ~50 tokens each = ~50M
tokens) — all generated JVM-side with spark.range + hash expressions, noop
sink, no driver materialization.

Covers the operators bench.py doesn't: quality_scores,
repetition_signals (the explode-heaviest curation stage), exact_dedup,
hash_split, pack_stats, sample_mixture.  The point is the growth shape:
every stage is per-row expression work or a doc_id-keyed
explode/re-aggregate, so time should scale ~linearly in tokens with no
skew cliffs.

Usage: python tools/scale_probe_curation.py [n_docs]
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
from dask_mwu_spark.operators.dedup import exact_dedup
from dask_mwu_spark.operators.text import quality_scores
from dask_mwu_spark.session import get_spark

VOCAB = [f"w{i}" for i in range(200)] + ["the", "a", "and", "of", "to"]


def synth_docs(spark, n_docs: int):
    """Deterministic pseudo-random docs, 20-80 tokens, built entirely from
    JVM expressions; ~0.1% exact-duplicate pairs via id folding."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    # fold the top 0.1% of ids onto low ids -> exact duplicate texts
    seed = F.when(
        F.col("id") >= int(n_docs * 0.999), F.col("id") - int(n_docs * 0.999)
    ).otherwise(F.col("id"))
    n_words = (F.pmod(F.xxhash64(seed), F.lit(61)) + 20).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(seed * 1000 + i.cast("long")), F.lit(len(VOCAB))) + 1).cast("int")
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20)).alias("source"),
        F.length(F.array_join(words, " ")).cast("long").alias("n_chars"),
    )


def timed(name, df):
    """Run twice, report the steady-state (2nd) time — first execution of
    each stage pays one-time codegen + JIT warmup that varies 2-3x run to
    run (same policy as bench.py's median-of-3)."""
    runs = []
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "metric": f"curation_probe_{name}",
                "value": runs[-1],
                "cold": runs[0],
                "unit": "sec",
            }
        ),
        flush=True,
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("curation-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n_docs).persist()
    print(json.dumps({"n_docs": docs.count()}), flush=True)
    timed("quality", quality_scores(docs))
    timed("repetition", cur.repetition_signals(docs))
    timed("exact_dedup", exact_dedup(docs))
    timed("hash_split", cur.hash_split(docs))
    timed("pack_stats", cur.pack_stats(docs, max_tokens=2048, n_shards=256))
    timed(
        "sample_mixture",
        cur.sample_mixture(docs, {"src0": 1.0, "src1": 0.5}, default_rate=0.25),
    )
    docs.unpersist()


if __name__ == "__main__":
    main()
