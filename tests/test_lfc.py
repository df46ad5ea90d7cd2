"""L1/L2 differential tests (reference tests/test_log_fold_change.py)."""

import numpy as np
import pytest

from dask_mwu_spark.operators.logfoldchange import compute_logfoldchange
from dask_mwu_spark.plans.pipeline import feature_group_stats

from tests import fixtures as fx
from tests.oracle import full_oracle


def _lfc(spark, data, labels, base=None):
    df = spark.createDataFrame(fx.to_long(data, labels))
    out = compute_logfoldchange(feature_group_stats(df), base=base).toPandas()
    return out.set_index(["feature", "group"]).sort_index()


@pytest.mark.parametrize("base", [None, 2, 10])
@pytest.mark.parametrize(
    "name,data,labels",
    [
        ("mixed_small", fx.MIXED / 50.0, fx.LABELS_5),
        ("two_groups", fx.POSITIVE / 25.0, fx.LABELS_2),
    ],
)
def test_lfc_matches_oracle(spark, name, data, labels, base):
    got = _lfc(spark, data, labels, base=base)
    exp = full_oracle(data, labels, base=base)
    for (feat, grp), e in exp.items():
        row = got.loc[(feat, str(grp))]
        np.testing.assert_allclose(row["mu1"], e["mu1"], rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(row["mu2"], e["mu2"], rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(
            row["logfoldchange"],
            e["lfc"],
            rtol=1e-9,
            atol=1e-12,
            err_msg=f"{name} {feat} {grp}",
        )


def test_all_zero_lfc_is_zero(spark):
    """expm1(0)+1e-9 on both sides -> lfc exactly 0
    (reference tests/test_log_fold_change.py:17)."""
    got = _lfc(spark, fx.ALL_ZERO, fx.LABELS_5)
    assert (got["logfoldchange"] == 0.0).all()


def test_single_group_rest_mean_null(spark):
    got = _lfc(spark, fx.POSITIVE, np.zeros(25, dtype=int))
    assert got["mu2"].isna().all()
    assert got["logfoldchange"].isna().all()
