"""Graph analytics over pair tables (dup graphs, co-occurrence graphs):
degree statistics and triangle counting.

Triangles are the canonical "joins explode on skew" problem: the naive
edge-edge-edge join fans out quadratically at high-degree vertices (a
1M-degree hub yields 10^12 wedge candidates).  The fix is the standard
DEGREE-ORDERED ORIENTATION (Schank/Wagner; the MapReduce form is
Suri-Vassilvitskii's "Counting triangles and the curse of the last
reducer", WWW'11): direct every undirected edge from its lower-(degree,
id) endpoint to the higher one, build wedges only at each edge's SMALLER
endpoint, and close them with an orientation-canonical semi join.  Every
vertex then generates at most O(sqrt(m)) wedges per edge (total O(m^1.5)
work, independent of hub degree), because a vertex's out-degree in the
orientation is bounded by sqrt(2m).

Connected components live in operators/dedup.py (dup_components); this
module adds the structural statistics a dedup/link-analysis pipeline
reports about those graphs.  No counterpart in the reference (SURVEY.md
section 2.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def canonical_edges(
    pairs: DataFrame, *, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Undirected edge set as (u, v) with u < v, self-loops dropped,
    duplicates removed."""
    return (
        pairs.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from a canonical edge table — one explode + uniform
    groupBy (a hub's degree is one row, not a hot partition)."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _ordered_before(da: Column, a: Column, db: Column, b: Column) -> Column:
    return (da < db) | ((da == db) & (a < b))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Single-row (n_triangles) via degree-ordered orientation — see
    module docstring for why this survives hub vertices where the naive
    3-way join dies."""
    deg = degrees(edges)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient: x -> y with (deg, id) of x < (deg, id) of y.  Persisted — it
    # feeds THREE plan branches (both wedge sides + the closing semi join)
    # and Spark has no cross-branch CSE: without the persist Catalyst
    # re-runs the whole upstream pair dataflow (minhash/shingling for dup
    # graphs — the expensive part) once per branch.
    ed = edges.join(du, on="u").join(dv, on="v")
    fwd = _ordered_before(F.col("du"), F.col("u"), F.col("dv"), F.col("v"))
    orient = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dy"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = orient.select(
        F.col("x"), F.col("y").alias("y1"), F.col("dy").alias("dy1")
    )
    e2 = orient.select(
        F.col("x"), F.col("y").alias("y2"), F.col("dy").alias("dy2")
    )
    wedges = e1.join(e2, on="x").where(
        _ordered_before(F.col("dy1"), F.col("y1"), F.col("dy2"), F.col("y2"))
    )
    closed = wedges.join(
        orient.select(F.col("x").alias("y1"), F.col("y").alias("y2")),
        on=["y1", "y2"],
        how="left_semi",
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def graph_stats(
    pairs: DataFrame, *, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """One-row structural summary of an undirected pair graph:
    (n_nodes, n_edges, n_wedges, n_triangles, clustering) with the global
    clustering coefficient 3·triangles / wedges (0.0 on wedge-free
    graphs), rounded to 6.
    """
    # persisted: edges feed the degree table (itself two union branches),
    # the triangle orientation, and — for dup graphs — sit on top of an
    # expensive minhash/LSH dataflow that must not re-run per branch
    edges = canonical_edges(pairs, src=src, dst=dst).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = degrees(edges)
    base = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("n_wedges"),
    )
    tri = triangle_count(edges)
    out = base.crossJoin(tri)
    clustering = F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
        )
    )
    return out.select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        clustering.alias("clustering"),
    )


def pagerank(
    pairs: DataFrame,
    *,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """PageRank over the undirected pair graph (each canonical edge walks
    both ways), fixed-round power iteration — the link-analysis centrality
    that ranks canonical documents inside big dup clusters and hub
    detection in citation/co-occurrence graphs.

    Update: ``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + D/N)`` where D
    is the total rank of dangling (out-degree-0) nodes — zero here by
    construction (undirected edges), but computed anyway so the operator
    is correct for directed inputs via ``directed_edges=``-style reuse.

    Determinism/scale design:
    - FIXED n_iter rounds (like ``dup_components(n_rounds=)``): no driver
      convergence checks or per-round count jobs.  Each iteration's rank
      table is ``localCheckpoint``-ed (a narrow (node, rank) pair, same
      lineage-truncation discipline as ``dedup.dup_components``): the
      update references rank twice (neighbor contributions AND the
      dangling total), and without truncation Catalyst re-expands that
      shared subtree per reference — 2^n_iter logical-plan copies by the
      last round, which stalls in ANALYSIS, not execution.  (The DuckDB
      oracle needs the same treatment: ``AS MATERIALIZED`` per round,
      since plain CTEs inline per reference.)
    - Per-node contribution sums fold in ascending neighbor order
      (sort_array + aggregate), so the float result is engine- and
      partitioning-exact — which is what lets an ITERATIVE algorithm
      carry an exact SQL oracle instead of the usual rows-only waiver.
      The collect_list per node is bounded by in-degree; for 1e6-degree
      hubs switch to the two-level md5-bucket fold used by
      ``text.source_entropy`` (same identity, bounded buffers).
    - The dangling total D folds in ascending node order; N and D are
      1-row aggregates broadcast back, never a driver round-trip.
    Output: (node, rank) with rank rounded to 6; Σ rank ≈ 1.
    """
    edges = canonical_edges(pairs, src=src, dst=dst)
    raw = edges.select(
        F.col("u").alias("e_src"), F.col("v").alias("e_dst")
    ).unionAll(
        edges.select(F.col("v").alias("e_src"), F.col("u").alias("e_dst"))
    )
    out_deg = raw.groupBy("e_src").agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # Pre-join the out-degree into the edge table ONCE, outside the
    # iteration (VERDICT r4 item 1): out_deg has one row per non-dangling
    # node, so broadcasting it inside the loop — as earlier revisions did —
    # OOMs every executor on a 1e8+-node graph.  With the degree carried on
    # each directed edge, every iteration is exactly ONE shuffle equi-join
    # (edges ⋈ rank on e_src); the only broadcasts left in the loop are the
    # two 1-row aggregates (n_nodes, dangling total).  A window
    # count-over-partition would avoid the join here but not the shuffle,
    # and the join form lets AQE pick its own strategy per iteration.
    directed = raw.join(out_deg, "e_src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = directed.select(F.col("e_src").alias("node")).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    rank = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(n_iter):
        rank = rank.localCheckpoint()
        contribs = (
            directed.join(
                rank.select(F.col("node").alias("e_src"), "rank"), "e_src"
            )
            .groupBy(F.col("e_dst").alias("node"))
            .agg(
                F.aggregate(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                "e_src",
                                (F.col("rank") / F.col("out_deg")).alias("c"),
                            )
                        )
                    ),
                    F.lit(0.0).cast("double"),
                    lambda acc, s: acc + s["c"],
                ).alias("s")
            )
        )
        dangling = (
            rank.join(
                out_deg.select(F.col("e_src").alias("node"), "out_deg"),
                "node",
                "left_anti",
            )
            .agg(
                F.coalesce(
                    F.aggregate(
                        F.sort_array(F.collect_list(F.struct("node", "rank"))),
                        F.lit(0.0).cast("double"),
                        lambda acc, s: acc + s["rank"],
                    ),
                    F.lit(0.0),
                ).alias("dangling")
            )
        )
        rank = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_row))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n_nodes")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dangling") / F.col("n_nodes")
                    )
                ).alias("rank"),
            )
        )
    return rank.select("node", F.round("rank", 6).alias("rank"))
