"""Graph-stats semantics on hand-built graphs."""

import pandas as pd

from dask_mwu_spark.operators.graph import (
    canonical_edges,
    degrees,
    graph_stats,
    triangle_count,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_a", "doc_b"])
    )


def test_canonicalization_dedups_and_orients(spark):
    e = canonical_edges(
        _pairs(spark, [(1, 2), (2, 1), (2, 3), (3, 3)])
    ).toPandas()
    assert sorted(map(tuple, e.values.tolist())) == [(1, 2), (2, 3)]


def test_triangle_count_k4(spark):
    # complete graph on 4 vertices: C(4,3) = 4 triangles, 12 wedges
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = canonical_edges(_pairs(spark, k4))
    assert triangle_count(edges).collect()[0].n_triangles == 4
    stats = graph_stats(_pairs(spark, k4)).collect()[0]
    assert (stats.n_nodes, stats.n_edges, stats.n_wedges) == (4, 6, 12)
    assert stats.clustering == 1.0


def test_triangle_count_hub_star_has_none(spark):
    # star graph (one hub): max wedges, zero triangles — the shape where
    # a naive wedge join explodes at the hub
    star = [(0, i) for i in range(1, 30)]
    stats = graph_stats(_pairs(spark, star)).collect()[0]
    assert stats.n_triangles == 0
    assert stats.n_wedges == 29 * 28 // 2
    assert stats.clustering == 0.0


def test_triangle_plus_tail(spark):
    # triangle {1,2,3} plus pendant 4: 1 triangle, wedges = 3*1 + at node
    # 3 (deg 3): 3 -> wedges 3 choose 2 = 3 ... compute: degs 1:2,2:2,3:3,4:1
    stats = graph_stats(
        _pairs(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    ).collect()[0]
    assert stats.n_triangles == 1
    assert stats.n_nodes == 4 and stats.n_edges == 4
    assert stats.n_wedges == 1 + 1 + 3 + 0
    assert stats.clustering == round(3 * 1 / 5, 6)


def test_degrees_count_both_endpoints(spark):
    deg = (
        degrees(canonical_edges(_pairs(spark, [(1, 2), (2, 3)])))
        .toPandas()
        .set_index("node")
        .deg.to_dict()
    )
    assert deg == {1: 1, 2: 2, 3: 1}


def test_kcore_triangle_survives_pendants_peel(spark):
    # triangle {1,2,3} with pendant chain 3-4-5: the 2-core is exactly
    # the triangle; round 1 drops 5, round 2 drops 4, stable after
    from dask_mwu_spark.operators.graph import kcore

    out = (
        kcore(_pairs(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]),
              k=2, n_rounds=3)
        .toPandas()
        .set_index("node")
        .deg.to_dict()
    )
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_chain_fully_peels(spark):
    # a path has no 2-core: endpoints peel inward one round per hop
    from dask_mwu_spark.operators.graph import kcore

    out = kcore(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]),
        k=2,
        n_rounds=3,
    ).toPandas()
    assert len(out) == 0


def test_kcore_fixed_rounds_is_a_prefix_of_full_peeling(spark):
    # with FEWER rounds than needed, the long chain is only partially
    # peeled — fixed-round semantics, deterministic and oracle-unrollable
    from dask_mwu_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(1, 8)]
    one = kcore(_pairs(spark, chain), k=2, n_rounds=1).toPandas()
    # round 1 removes only the two endpoints (1 and 8)
    assert sorted(one.node.tolist()) == [2, 3, 4, 5, 6, 7]


def test_kcore_validates_params(spark):
    import pytest as _pytest

    from dask_mwu_spark.operators.graph import kcore

    with _pytest.raises(ValueError):
        kcore(_pairs(spark, [(1, 2)]), k=0)
    with _pytest.raises(ValueError):
        kcore(_pairs(spark, [(1, 2)]), n_rounds=0)
