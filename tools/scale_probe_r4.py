"""Round-4 operator scale probe: duplicated-span detection/trim, BM25,
n-gram novelty, and token-balanced shards on the synthetic 1M-doc corpus
(~50M tokens; tools/scale_probe_curation.synth_docs — 0.1% planted exact
duplicates give the span operators real work).

What each probe is meant to show:
- duplicated_spans / span_dedup_stats / trim / novelty: time ~linear in
  corpus tokens (they are explode → uniform-key groupBy shapes with no
  self-join) — run at n and n/4 and compare the ratio to 4x.
- token_shards: the two-phase bucketed prefix sum vs n_buckets=1 (a single
  global window = one task sorting the whole corpus, the scale-killer the
  decomposition exists to avoid).
- bm25_topk: the full-corpus cost is the scan + doc-length projection;
  the term-filtered aggregate is near-free.

Usage: python tools/scale_probe_r4.py [n_docs]
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_mwu_spark.operators import curation as cur
from dask_mwu_spark.operators import dedup as dd
from dask_mwu_spark.operators import text as tx
from dask_mwu_spark.session import get_spark
from tools.scale_probe_curation import synth_docs


def timed(name, df, extra=None):
    runs = []
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 2))
    rec = {"metric": f"r4_probe_{name}", "value": runs[-1], "cold": runs[0],
           "unit": "sec"}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("r4-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (n_docs // 4, n_docs):
        docs = synth_docs(spark, n).persist()
        docs.count()
        tag = f"{n // 1000}k"
        timed(f"dup_spans_{tag}", dd.duplicated_spans(docs, n=5))
        timed(f"span_stats_{tag}", dd.span_dedup_stats(docs, n=5))
        timed(f"novelty_{tag}", tx.ngram_novelty(docs, n=3))
        docs.unpersist()
    docs = synth_docs(spark, n_docs).persist()
    docs.count()
    tag = f"{n_docs // 1000}k"
    timed(f"trim_spans_{tag}", dd.trim_duplicated_spans(docs, n=5))
    timed(
        f"bm25_{tag}",
        tx.bm25_topk(docs, ["the", "a", "w1", "w2"], k=10),
    )
    timed(
        f"token_shards_bucketed_{tag}",
        cur.token_shard_stats(docs, shard_tokens=1 << 20, n_buckets=256),
        extra={"n_buckets": 256},
    )
    timed(
        f"token_shards_single_window_{tag}",
        cur.token_shard_stats(docs, shard_tokens=1 << 20, n_buckets=1),
        extra={"n_buckets": 1},
    )
    docs.unpersist()


if __name__ == "__main__":
    main()
