"""A1-A6 differential tests vs the numpy oracle (reference
tests/test_p_vals.py: same fixture matrix, same expectations incl. the
fully-tied matrix where sigma=0 and p must clip to 1)."""

import numpy as np
import pytest

from dask_mwu_spark.plans.pipeline import feature_group_stats

from tests import fixtures as fx
from tests.oracle import full_oracle


def _stats(spark, data, labels):
    df = spark.createDataFrame(fx.to_long(data, labels))
    out = feature_group_stats(df).toPandas()
    return out.set_index(["feature", "group"]).sort_index()


@pytest.mark.parametrize(
    "name,data,labels",
    [
        ("positive", fx.POSITIVE, fx.LABELS_5),
        ("negative", fx.NEGATIVE, fx.LABELS_5),
        ("mixed", fx.MIXED, fx.LABELS_5),
        ("ties_dense", fx.TIES_DENSE, fx.LABELS_6_SMALL),
        ("two_groups", fx.MIXED, fx.LABELS_2),
        ("string_labels", fx.MIXED, fx.LABELS_STR),
    ],
)
def test_u_z_p_padj_match_oracle(spark, name, data, labels):
    got = _stats(spark, data, labels)
    exp = full_oracle(data, labels)
    for (feat, grp), e in exp.items():
        row = got.loc[(feat, str(grp))]
        assert row["n1"] == e["n1"] and row["n2"] == e["n2"]
        assert row["rank_sum"] == e["rank_sum"], (name, feat, grp)
        assert row["tie_term"] == e["tie_term"], (name, feat, grp)
        assert row["u_stat"] == e["u"], (name, feat, grp)
        if np.isnan(e["z"]):
            assert row["z"] is None or np.isnan(row["z"])
        else:
            assert row["z"] == e["z"], (name, feat, grp)
            assert row["p_value"] == e["p"], (name, feat, grp)
            assert row["p_adjusted"] == e["p_adj"], (name, feat, grp)


def test_all_tied_matrix_p_is_one(spark):
    """sigma=0 -> z=-inf -> p=1 (reference tests/test_p_vals.py:36-46)."""
    got = _stats(spark, fx.TIES_DENSE, fx.LABELS_6_SMALL)
    assert (got["p_value"] == 1.0).all()
    assert np.isinf(got["z"]).all() and (got["z"] < 0).all()


def test_nan_feature_yields_null_stats(spark):
    got = _stats(spark, fx.WITH_NANS, fx.LABELS_5)
    nan_feats = [
        f"gene_{f}"
        for f in range(fx.WITH_NANS.shape[1])
        if np.isnan(fx.WITH_NANS[:, f]).any()
    ]
    for feat in nan_feats:
        sub = got.loc[feat]
        assert sub["rank_sum"].isna().all()
        assert sub["u_stat"].isna().all()
    clean = got.drop(index=nan_feats, level=0)
    assert clean["u_stat"].notna().all()


def test_single_observation_degenerate(spark):
    """n=1: z and p are NULL (reference: NaN under errstate-ignore,
    pvals.py:57)."""
    got = _stats(spark, fx.MINIMAL, np.array([0]))
    row = got.loc[("gene_0", "0")]
    assert row["u_stat"] == 0.0
    assert np.isnan(row["z"]) and np.isnan(row["p_value"])


def test_bh_tie_invariance(spark):
    """Equal p-values: suffix-cummin makes BH invariant to tie index
    assignment (SURVEY.md A5 risk 4)."""
    import pandas as pd

    from dask_mwu_spark.operators.mwu import bh_adjust

    pdf = pd.DataFrame(
        {
            "group": ["g"] * 6,
            "feature": [f"f{i}" for i in range(6)],
            "p_value": [0.01, 0.04, 0.04, 0.04, 0.2, 1.0],
        }
    )
    got = (
        bh_adjust(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("feature")["p_adjusted"]
        .to_numpy()
    )
    from tests.oracle import bh

    np.testing.assert_allclose(got, bh(pdf["p_value"].to_numpy()), rtol=0, atol=0)
