"""BPE merge-training scale probe: is the per-round cost really
corpus-size independent, and is training invariant under corpus growth?

``bpe_train_merges`` claims the classic BPE decomposition: ONE
corpus-scale tokenize scan builds the word-frequency table, then every
merge round runs on that vocabulary-bounded table.  This probe checks
both halves on synthetic corpora that hold the VOCABULARY fixed while
the corpus grows k-fold:

- ``scan_sec``: tokenize + groupBy(word) count alone — the corpus-scale
  floor that SHOULD grow with k;
- ``train_sec``: full bpe_train_merges(n_merges) minus nothing — rounds
  ride on the bounded table, so (train_sec - scan_sec) should stay
  roughly flat as the corpus grows;
- merge-table equality across scales: duplicating the corpus scales all
  pair counts uniformly, so the learned (merge_rank, lhs, rhs) sequence
  must be IDENTICAL and pair_count exactly k-fold — a strong
  scale-invariance check on the whole trainer.

Usage: python tools/scale_probe_bpe.py [n_docs_base] [k] [n_merges]
Default 204,800 docs x ~12 tokens, k=16, n_merges=6.  The default base
is a multiple of every word-id modulus (max 2^11), so each word's
frequency is EXACTLY n/m and the k-fold pair-count check is exact.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.text import bpe_train_merges, tokens
from dask_mwu_spark.session import get_spark


def synth_docs(spark, n_docs: int):
    """~12 tokens/doc over a FIXED ~2.2k-word vocabulary (id-mixing keeps
    the word distribution zipf-ish but scale-independent, so growing
    n_docs grows the corpus without growing the training table)."""
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        (
                            (F.col("id") * (2 * j + 1) + j * j)
                            % F.lit(2 ** (1 + (j * 7) % 11))
                        ).cast("string"),
                    )
                    for j in range(12)
                ],
            ).alias("text"),
        )
    )


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 204_800
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    spark = get_spark("scale-probe-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen paths so the 1x timings aren't first-job costs
    synth_docs(spark, 10_000).selectExpr("sum(length(text))").collect()

    out: dict[str, object] = {"n_docs_base": n_base, "k": k, "n_merges": n_merges}
    tables = {}
    for label, n in (("1x", n_base), ("kx", n_base * k)):
        docs = synth_docs(spark, n)
        t0 = time.time()
        wf = (
            tokens(docs)
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        vocab_size = wf.count()
        out[f"scan_sec_{label}"] = round(time.time() - t0, 2)
        out[f"vocab_{label}"] = vocab_size
        t0 = time.time()
        tables[label] = [
            (r.merge_rank, r.lhs, r.rhs, r.pair_count)
            for r in bpe_train_merges(docs, n_merges=n_merges).collect()
        ]
        out[f"train_sec_{label}"] = round(time.time() - t0, 2)

    seq_1x = [(m, l, r) for m, l, r, _ in tables["1x"]]
    seq_kx = [(m, l, r) for m, l, r, _ in tables["kx"]]
    out["merges_identical"] = seq_1x == seq_kx
    out["counts_exactly_k_fold"] = all(
        ck == c1 * k
        for (*_, c1), (*_, ck) in zip(tables["1x"], tables["kx"])
    )
    out["rounds_sec_1x"] = round(out["train_sec_1x"] - out["scan_sec_1x"], 2)
    out["rounds_sec_kx"] = round(out["train_sec_kx"] - out["scan_sec_kx"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
