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


def _kw_numpy(groups):
    """Plain-numpy Kruskal-Wallis H + df=2 p for a list of 1-D samples."""
    all_v = np.concatenate(groups)
    order = np.argsort(all_v, kind="mergesort")
    ranks = np.empty(len(all_v))
    sorted_v = all_v[order]
    i = 0
    pos = 1
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        avg = (pos + pos + (j - i)) / 2.0
        ranks[order[i : j + 1]] = avg
        pos += j - i + 1
        i = j + 1
    n = len(all_v)
    off = 0
    s = 0.0
    tie = 0.0
    _, counts = np.unique(all_v, return_counts=True)
    tie = float(np.sum(counts.astype(float) ** 3 - counts))
    for g in groups:
        r = ranks[off : off + len(g)].sum()
        s += r * r / len(g)
        off += len(g)
    h_raw = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    corr = 1.0 - tie / (float(n) ** 3 - n)
    h = h_raw / corr
    return h, np.exp(-h / 2.0) if len(groups) == 3 else None


def test_kruskal_wallis_matches_numpy(spark):
    from dask_mwu_spark.operators.mwu import (
        compute_in_group_ranksum,
        kruskal_wallis,
    )
    from dask_mwu_spark.operators.ranking import rank_values

    ga = [1.0, 3.0, 5.0, 7.0, 7.0]
    gb = [2.0, 4.0, 6.0, 7.0]
    gc = [8.0, 9.0, 2.0]
    import pandas as pd

    rows = (
        [("f", "a", v) for v in ga]
        + [("f", "b", v) for v in gb]
        + [("f", "c", v) for v in gc]
    )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["feature", "group", "value"])
    )
    out = (
        kruskal_wallis(compute_in_group_ranksum(rank_values(df)))
        .toPandas()
        .iloc[0]
    )
    h_exp, p_exp = _kw_numpy(
        [np.array(ga), np.array(gb), np.array(gc)]
    )
    assert out.n_obs == 12 and out.n_groups == 3
    assert out.h_stat == round(h_exp, 6)
    assert abs(out.p_value - p_exp) < 1e-6


def test_kruskal_wallis_all_tied_is_null(spark):
    # every value identical: tie correction C = 0 -> H undefined (NULL),
    # p NULL too
    from dask_mwu_spark.operators.mwu import (
        compute_in_group_ranksum,
        kruskal_wallis,
    )
    from dask_mwu_spark.operators.ranking import rank_values
    import pandas as pd

    rows = [("f", g, 5.0) for g in ["a", "a", "b", "b", "c"]]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["feature", "group", "value"])
    )
    out = (
        kruskal_wallis(compute_in_group_ranksum(rank_values(df)))
        .toPandas()
        .iloc[0]
    )
    assert np.isnan(out.h_stat) or out.h_stat is None


def test_kruskal_wallis_nan_poisoned_is_null(spark):
    # ADVICE r5: a NaN-poisoned feature must return NULL h/p via the
    # EXPLICIT has_nan gate (scipy propagate semantics), not incidental
    # NULL propagation — and a clean feature in the same table is
    # unaffected.
    from dask_mwu_spark.operators.mwu import (
        compute_in_group_ranksum,
        kruskal_wallis,
    )
    from dask_mwu_spark.operators.ranking import rank_values
    import pandas as pd

    rows = (
        [("poisoned", "a", 1.0), ("poisoned", "a", float("nan")),
         ("poisoned", "b", 2.0), ("poisoned", "c", 3.0)]
        + [("clean", g, v) for g, v in
           [("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0),
            ("c", 8.0), ("c", 9.0)]]
    )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["feature", "group", "value"])
    )
    out = (
        kruskal_wallis(compute_in_group_ranksum(rank_values(df)))
        .toPandas()
        .set_index("feature")
    )
    assert np.isnan(out.loc["poisoned"].h_stat)
    assert np.isnan(out.loc["poisoned"].p_value)
    assert np.isfinite(out.loc["clean"].h_stat)
    assert np.isfinite(out.loc["clean"].p_value)
