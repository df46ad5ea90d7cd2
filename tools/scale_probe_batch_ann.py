"""Batch dense-ANN scale probe: ivf_batch_topk claims ONE persisted
index serves every query in the batch (probes broadcast onto the
posting lists; corpus vectors never shuffle; rank windows are
partitioned by query_id), so wall should grow far sub-linearly in
n_queries — the dense twin of the bm25_batch claim measured by
tools/scale_probe_retrieval.py.

- ``ivf_sec_q{a,b,c}``: ivf_batch_topk wall at n_queries = 8, 64, 512
  over the SAME synthetic corpus — the 64x point should be nowhere
  near 64x the 8-query wall (the index build + corpus scan dominate;
  per-query cost is the probed-cell candidate set + its rank window);
- ``ivf_sec_kx``: 8 queries over a k-times larger corpus — ~linear
  (the index build is the corpus-sized work);
- ``brute_sec_qa``: cosine_batch_topk at 8 queries for the
  brute-force reference point;
- ``qa_rerun_identical``: the 8-query run repeated must be
  bit-identical (every score is rounded-to-6 before ranking with id
  tiebreaks — the package determinism contract).

Usage: python tools/scale_probe_batch_ann.py [n_vecs] [k_growth]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_mwu_spark.operators.similarity import (  # noqa: E402
    EMB_DIM,
    cosine_batch_topk,
    ivf_batch_topk,
)
from dask_mwu_spark.session import get_spark  # noqa: E402


def synth_emb(spark, n: int):
    """Deterministic synthetic embeddings (JVM-side sin hash — no
    Python loop, no randomness source; identical across runs)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
            lambda d: F.sin(F.col("id") * 31.0 + d * 7.0 + 1.0),
        ).alias("embedding"),
    )


def _queries(emb, n_queries: int):
    """The first n_queries corpus vectors re-badged as an external
    (query_id, embedding) table (ids offset so no accidental overlap
    semantics are implied)."""
    return emb.where(F.col("vec_id") < n_queries).select(
        (F.col("vec_id") + 1_000_000).alias("query_id"), "embedding"
    )


def main() -> int:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    kx = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("scale-probe-batch-ann")
    spark.sparkContext.setLogLevel("ERROR")
    from dask_mwu_spark import release_caches

    # warm the codepath (codegen + shuffle machinery)
    warm = synth_emb(spark, 5_000)
    ivf_batch_topk(warm, _queries(warm, 4), k=5).collect()
    release_caches()

    out: dict[str, object] = {"n_vecs": n_vecs, "k_growth": kx}
    tables = {}
    for label, nv, nq in (
        ("qa", n_vecs, 8),
        ("qb", n_vecs, 64),
        ("qc", n_vecs, 512),
        ("kx", n_vecs * kx, 8),
        ("qa2", n_vecs, 8),
    ):
        emb = synth_emb(spark, nv)
        t0 = time.time()
        rows = ivf_batch_topk(emb, _queries(emb, nq), k=5).collect()
        out[f"ivf_sec_{label}"] = round(time.time() - t0, 2)
        out[f"rows_{label}"] = len(rows)
        tables[label] = sorted(
            (r["query_id"], r["vec_id"], r["cosine"], r["rank"]) for r in rows
        )
        release_caches()
    out["qa_rerun_identical"] = tables["qa"] == tables["qa2"]

    emb = synth_emb(spark, n_vecs)
    t0 = time.time()
    n = len(cosine_batch_topk(emb, _queries(emb, 8), k=5).collect())
    out["brute_sec_qa"] = round(time.time() - t0, 2)
    out["brute_rows_qa"] = n

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
