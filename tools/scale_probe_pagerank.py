"""PageRank scale probe: the round-5 pre-joined-degree plan on graphs far
beyond the bench corpus, including a severe in-degree hub.

What it measures (VERDICT r4 item 1 follow-through):
- wall-clock vs edge count at fixed n_iter — the pre-joined form should be
  ~linear in edges (each iteration is ONE shuffle equi-join edges ⋈ rank
  plus a grouped fold; nothing is quadratic and nothing node-cardinality
  is broadcast),
- a hub variant where one node has ``hub_deg`` in-neighbors: the per-node
  sort_array+aggregate contribution fold collects the hub's in-edge list
  into one aggregation buffer, so this axis measures the documented
  bounded-by-in-degree trade-off directly (the docstring's escape hatch
  for 1e6+-degree hubs is the two-level md5-bucket fold).

Rank mass is asserted to sum to ~1 on every run — a wrong dangling or
degree join shows up as mass leakage long before it shows up in timings.

Usage: python tools/scale_probe_pagerank.py [n_edges] [n_nodes] [hub_deg]
Default 1,000,000 edges / 100,000 nodes, then 4x the edges (scaling row),
then the hub variant at 100,000 in-degree.  One JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.graph import pagerank
from dask_mwu_spark.session import get_spark


def synth_pairs(spark, n_edges: int, n_nodes: int):
    return spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("doc_a"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_003), F.lit(n_nodes)).alias(
            "doc_b"
        ),
    )


def hub_pairs(spark, n_edges: int, n_nodes: int, hub_deg: int):
    base = synth_pairs(spark, n_edges, n_nodes)
    hub = spark.range(hub_deg).select(
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(n_nodes)).alias("doc_a"),
        F.lit(n_nodes // 2).cast("long").alias("doc_b"),
    )
    return base.unionAll(hub)


def timed(name: str, pairs, n_iter: int = 5) -> None:
    t0 = time.time()
    out = pagerank(pairs, n_iter=n_iter).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("rank").alias("mass"),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    assert abs(out.mass - 1.0) < 1e-3, f"rank mass leaked: {out.mass}"
    print(
        json.dumps(
            {
                "metric": f"pagerank_probe_{name}",
                "n_nodes": out.n_nodes,
                "rank_mass": round(out.mass, 6),
                "n_iter": n_iter,
                "value": wall,
                "unit": "sec",
            }
        ),
        flush=True,
    )


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    hub_deg = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    spark = get_spark("pagerank-probe")
    spark.sparkContext.setLogLevel("ERROR")

    timed("base", synth_pairs(spark, n_edges, n_nodes))
    timed("4x_edges", synth_pairs(spark, 4 * n_edges, 2 * n_nodes))
    timed("hub", hub_pairs(spark, n_edges, n_nodes, hub_deg))


if __name__ == "__main__":
    main()
