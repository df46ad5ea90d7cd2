"""Heavy-hitters boundary probe: what does the Misra-Gries Arrow/Python
pass actually cost, and does two-pass still beat the vocabulary shuffle?

``heavy_hitters`` pass 1 is the one place in the text stack where the full
token stream crosses the Arrow boundary into Python (no builtin expresses
the mergeable decrement-all MG step).  This probe prices that boundary on
a zipf-ish synthetic corpus with a genuinely large vocabulary (the shape
where MG matters — the 205-word bench corpus never evicts a counter):

- ``scan_sec``: tokenize + count, pure JVM — the floor every pass rides on
- ``mg_sec``: pass 1 alone (tokenize + Arrow + Python MG + distinct)
- ``two_pass_sec``: full heavy_hitters (candidates + exact recount)
- ``shuffle_sec``: the full GROUP BY word HAVING baseline it replaces
- result equality of the last two (both exact by construction)

Usage: python tools/scale_probe_heavy_hitters.py [n_docs] [theta]
Default 1,000,000 docs x ~50 tokens (~50M tokens) x 0.001.
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.text import heavy_hitters, mg_candidates, tokens
from dask_mwu_spark.session import get_spark


def synth_docs(spark, n_docs: int):
    """~50 tokens/doc; word ids drawn at mixed scales (id % 2^(1+h%17)) so
    frequency falls off zipf-ish across a ~100k-word effective vocabulary
    and MG counters genuinely evict."""
    n_words = (F.pmod(F.xxhash64("id"), F.lit(41)) + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(F.col("id") * 100 + i.cast("long")),
                F.pow(
                    F.lit(2.0),
                    (F.pmod(F.xxhash64(i.cast("long"), F.col("id")), F.lit(17)) + 1).cast("double"),
                ).cast("bigint"),
            ),
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    theta = float(sys.argv[2]) if len(sys.argv) > 2 else 0.001
    spark = get_spark("scale-probe-heavy-hitters")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n_docs).persist()
    docs.count()
    toks = tokens(docs).select("word")

    out: dict[str, float | int] = {"n_docs": n_docs, "theta": theta}
    t0 = time.time()
    out["n_tokens"] = toks.count()
    out["scan_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["n_candidates"] = mg_candidates(toks, int(math.ceil(1.0 / theta))).count()
    out["mg_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    hh = {(r.word, r.n_occurrences) for r in heavy_hitters(docs, theta=theta).collect()}
    out["two_pass_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    totals = toks.agg(F.count(F.lit(1)).alias("_n"))
    shuffled = {
        (r.word, r.n_occurrences)
        for r in toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(totals))
        .where(F.col("n_occurrences") >= F.lit(theta) * F.col("_n"))
        .select("word", "n_occurrences")
        .collect()
    }
    out["shuffle_sec"] = round(time.time() - t0, 2)
    out["n_heavy"] = len(hh)
    out["identical"] = hh == shuffled
    assert out["identical"], (len(hh), len(shuffled))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
