"""Large-n_merges BPE probe (VERDICT r8 item 3): the engine="local"
path's wall-clock must grow with the MERGE COUNT, not the corpus, and
must beat the distributed per-round-job regime once rounds dominate.

Three measurements on the synthetic fixed-vocabulary corpus
(tools/scale_probe_bpe.synth_docs):

- ``local_sec_{m}`` at n_merges in (256, 1024) on the SAME corpus —
  the ratio should track the merge count (the sequential loop is
  O(n_merges x total_symbols) over the collected vocabulary-bounded
  table), proving wall ∝ merges;
- ``local_sec_256_kx`` at n_merges=256 on a k-fold corpus — should be
  ~flat vs ``local_sec_256`` (the corpus only touches the one
  distributed tokenize scan that builds the collected table);
- ``dist_sec_64`` vs ``local_sec_64`` at n_merges=64 — the crossover
  evidence: the distributed loop pays ~n_merges round jobs + n_merges
  isEmpty() driver actions, the local loop pays one collect.

Equality of the learned tables across engines is pytest-pinned
(tests/test_r9_ops.py); this probe records the PERFORMANCE claim.

Usage: python tools/scale_probe_bpe_local.py [n_docs] [k]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_mwu_spark.operators.text import bpe_train_merges
from dask_mwu_spark.session import get_spark
from scale_probe_bpe import synth_docs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 204_800
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("scale-probe-bpe-local")
    spark.sparkContext.setLogLevel("ERROR")
    synth_docs(spark, 10_000).selectExpr("sum(length(text))").collect()

    out: dict[str, object] = {"n_docs": n_docs, "k": k}

    def timed(key: str, n: int, n_merges: int, engine: str) -> None:
        t0 = time.time()
        rows = bpe_train_merges(
            synth_docs(spark, n), n_merges=n_merges, engine=engine
        ).collect()
        out[key] = round(time.time() - t0, 2)
        out[key + "_rows"] = len(rows)

    timed("dist_sec_64", n_docs, 64, "distributed")
    timed("local_sec_64", n_docs, 64, "local")
    timed("local_sec_256", n_docs, 256, "local")
    timed("local_sec_1024", n_docs, 1024, "local")
    timed("local_sec_256_kx", n_docs * k, 256, "local")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
