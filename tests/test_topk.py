"""F1 tests: per-group top-k, sort direction, tiebreak determinism
(reference tests/test_create_df.py)."""

import numpy as np
import pandas as pd
import pytest

from dask_mwu_spark.errors import InvalidDimensionError
from dask_mwu_spark.operators.topk import create_df
from dask_mwu_spark.plans.pipeline import rank_features_by_group

from tests import fixtures as fx


def _stats_df(spark):
    pdf = pd.DataFrame(
        {
            "group": ["a"] * 4 + ["b"] * 4,
            "feature": ["g0", "g1", "g2", "g3"] * 2,
            "u_stat": [1.0, 2.0, 3.0, 4.0] * 2,
            "p_value": [0.1, 0.2, 0.3, 0.4] * 2,
            "p_adjusted": [0.4, 0.4, 0.4, 0.4] * 2,
            "logfoldchange": [-3.0, 1.0, -1.0, 2.0, 0.5, 0.5, -0.5, 2.5],
        }
    )
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("top_n,expect_a", [(None, 4), (2, 2), (0, 0), (4, 4)])
def test_top_n(spark, top_n, expect_a):
    out = create_df(_stats_df(spark), top_n=top_n).toPandas()
    assert len(out[out.group == "a"]) == expect_a


def test_desc_order_and_columns(spark):
    out = (
        create_df(_stats_df(spark), top_n=2, sort_by="desc")
        .toPandas()
        .sort_values(["group", "abs_logfoldchange"], ascending=[True, False])
    )
    a = out[out.group == "a"]
    assert list(a.gene) == ["g0", "g3"]  # |−3| then |2|
    assert list(out.columns) == [
        "group",
        "gene",
        "U",
        "p_value",
        "p_adjusted",
        "logfoldchange",
        "abs_logfoldchange",
    ]


def test_asc_order(spark):
    out = create_df(_stats_df(spark), top_n=2, sort_by="asc").toPandas()
    a = out[out.group == "a"].sort_values("abs_logfoldchange")
    assert list(a.gene) == ["g1", "g2"]  # |1| before |−1| by feature tiebreak


def test_tiebreak_deterministic(spark):
    """Equal |lfc| -> feature-name order decides (SURVEY.md F1 risk 3)."""
    out = create_df(_stats_df(spark), top_n=1, sort_by="asc").toPandas()
    b = out[out.group == "b"]
    # group b abs lfc = [0.5, 0.5, 0.5, 2.5]: three-way tie at 0.5 -> the
    # feature-name tiebreak must deterministically pick g0
    assert list(b.gene) == ["g0"]


def test_invalid_args(spark):
    with pytest.raises(InvalidDimensionError):
        create_df(_stats_df(spark), top_n=-1)
    with pytest.raises(InvalidDimensionError):
        create_df(_stats_df(spark), sort_by="sideways")


@pytest.mark.parametrize("n_features,top_n", [(100, 101), (100, -1), (4, 5)])
def test_top_n_upper_bound(spark, n_features, top_n):
    """V2 parity: reference rejects top_n > n_genes (create_df.py:44-52,
    tests/test_create_df.py::test_invalid_n) — eager, no count job."""
    with pytest.raises(InvalidDimensionError):
        create_df(_stats_df(spark), top_n=top_n, n_features=n_features)


def test_top_n_at_bound_ok(spark):
    out = create_df(_stats_df(spark), top_n=4, n_features=4).toPandas()
    assert len(out[out.group == "a"]) == 4


def test_pipeline_threads_n_features(spark):
    df = spark.createDataFrame(fx.to_long(fx.MIXED / 50.0, fx.LABELS_5))
    n_feat = fx.MIXED.shape[0]
    with pytest.raises(InvalidDimensionError):
        rank_features_by_group(df, top_n=n_feat + 1, n_features=n_feat)


def test_full_pipeline_smoke(spark):
    df = spark.createDataFrame(fx.to_long(fx.MIXED / 50.0, fx.LABELS_5))
    out = rank_features_by_group(df, top_n=3).toPandas()
    assert set(out.group.unique()) == {str(g) for g in np.unique(fx.LABELS_5)}
    assert (out.groupby("group").size() == 3).all()
    assert out["U"].notna().all()
