"""k-core scale probe: fixed-round peeling over synthetic dup graphs.

What the probe is meant to show:
- Each round is one degree aggregate + two LEFT SEMI joins, all keyed on
  node ids — wall time should grow ~linearly in edge count at a fixed
  round budget (no all-pairs blowup), and a planted mega-hub must NOT
  create a hot task (a hub's degree is one groupBy row).
- Peeling correctness at scale: a planted clique survives 2-core peeling
  while the random sparse background (average degree ~1) peels away.

Graph shape: `n_edges` random edges over `n_edges` nodes (supercritical
sparse graph, some 2-core) + one 50-node planted clique + one degree-50k
star hub (the skew case).

Usage: python tools/scale_probe_kcore.py [n_edges]
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.graph import kcore
from dask_mwu_spark.session import get_spark


def synth_pairs(spark, n_edges: int):
    """Random sparse graph + planted 50-clique + 50k-degree star hub."""
    rand = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n_edges)).alias("doc_a"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n_edges)).alias("doc_b"),
        )
    )
    base = n_edges + 10
    clique = spark.range(50).alias("x").crossJoin(
        spark.range(50).alias("y")
    ).select(
        (F.lit(base) + F.col("x.id")).alias("doc_a"),
        (F.lit(base) + F.col("y.id")).alias("doc_b"),
    ).where(F.col("doc_a") < F.col("doc_b"))
    hub_center = base + 100
    star = spark.range(50_000).select(
        F.lit(hub_center).alias("doc_a"),
        (F.lit(hub_center) + 1 + F.col("id")).alias("doc_b"),
    )
    return rand.unionAll(clique).unionAll(star)


def probe(spark, n_edges: int) -> dict:
    pairs = synth_pairs(spark, n_edges)
    t0 = time.monotonic()
    # kcore does its heavy work eagerly (localCheckpoint per round), so
    # time the call AND the action together (repo probe discipline)
    out = kcore(pairs, k=2, n_rounds=4)
    rows = out.count()
    wall = time.monotonic() - t0
    clique_deg = (
        out.where(F.col("node") >= n_edges + 10)
        .agg(F.min("deg").alias("m"))
        .collect()[0]
        .m
    )
    return {
        "n_edges": n_edges,
        "kcore_nodes": rows,
        "clique_min_deg": clique_deg,
        "wall_s": round(wall, 2),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("kcore-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n_edges in (n // 4, n):
        r = probe(spark, n_edges)
        # the planted 50-clique is a 49-core: it MUST survive 2-core
        # peeling with full internal degree
        assert r["clique_min_deg"] == 49, r
        print(json.dumps(r))


if __name__ == "__main__":
    main()
