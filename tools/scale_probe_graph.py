"""Triangle-counting scale probe: degree-ordered orientation vs the naive
wedge join on a graph with a severe hub — the shape that kills the naive
plan ("curse of the last reducer").

Graph: ``n_edges`` random edges over ``n_nodes`` vertices PLUS one hub
connected to ``hub_deg`` vertices.  The naive wedge join materializes
~hub_deg^2/2 candidate wedges at the hub; the oriented form bounds every
vertex's wedge fan-out by its OUT-degree in the (deg, id) orientation,
which is O(sqrt(m)) — the hub's edges all point AWAY from their
low-degree endpoints, so the hub builds no wedges at all.

Usage: python tools/scale_probe_graph.py [n_edges] [n_nodes] [hub_deg]
Default 1,000,000 edges / 100,000 nodes / 50,000-degree hub.  The naive
comparison runs on a reduced hub (10k) so it finishes at all; one JSON
line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators.graph import canonical_edges, triangle_count
from dask_mwu_spark.session import get_spark


def synth_graph(spark, n_edges: int, n_nodes: int, hub_deg: int):
    rand = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("doc_a"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_003), F.lit(n_nodes)).alias("doc_b"),
    )
    # hub at the MIDDLE of the id range: the naive a<b<c wedge join builds
    # wedges at the middle vertex b, which needs both in-edges (from lower
    # ids) and out-edges (to higher ids) — a mid-range hub has ~deg/2 of
    # each, so ~deg^2/4 wedge candidates.  (A hub at id 0 or id max is the
    # LUCKY case for the naive join: id ordering accidentally gives it
    # zero in- or out-edges.)  The degree orientation is immune to where
    # the hub sits — that is the point.
    mid = n_nodes // 2
    half = (F.col("id") / 2).cast("long") + 1
    neighbor = F.when(F.col("id") % 2 == 0, F.lit(mid) - half).otherwise(
        F.lit(mid) + half
    )
    hub = spark.range(hub_deg).select(
        neighbor.alias("doc_a"), F.lit(mid).cast("long").alias("doc_b")
    )
    return canonical_edges(rand.unionAll(hub))


def naive_triangles(edges):
    """The textbook 3-way join on id-ordered edges — quadratic at hubs."""
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return (
        e1.join(e2, on="b").join(e3, on=["a", "c"], how="left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def timed(name, df):
    t0 = time.time()
    row = df.collect()[0]
    print(
        json.dumps(
            {
                "metric": f"graph_probe_{name}",
                "n_triangles": row.n_triangles,
                "value": round(time.time() - t0, 2),
                "unit": "sec",
            }
        ),
        flush=True,
    )


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    hub_deg = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    spark = get_spark("graph-probe")
    spark.sparkContext.setLogLevel("ERROR")

    big = synth_graph(spark, n_edges, n_nodes, hub_deg).persist()
    print(json.dumps({"edges": big.count(), "hub_deg": hub_deg}), flush=True)
    timed("oriented_full", triangle_count(big))
    big.unpersist()

    # naive only survives a reduced hub (deg^2/4 wedges at the hub)
    small_hub = 30_000
    small = synth_graph(spark, n_edges, n_nodes, small_hub).persist()
    print(json.dumps({"edges": small.count(), "hub_deg": small_hub}), flush=True)
    timed("oriented_smallhub", triangle_count(small))
    timed("naive_smallhub", naive_triangles(small))
    small.unpersist()


if __name__ == "__main__":
    main()
