"""Property-based differential tests (hypothesis): random small matrices vs
the numpy oracle — beyond the reference's fixed fixture matrix (SURVEY.md
section 5 notes the reference has no property testing; we add it).

Spark jobs are slow per example, so examples are few but each covers the
full statistic stack; shrinking still gives minimal counterexamples.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_mwu_spark.operators.mwu import bh_adjust
from dask_mwu_spark.plans.pipeline import feature_group_stats

from tests import fixtures as fx
from tests.oracle import bh as bh_oracle
from tests.oracle import full_oracle

# small-int matrices maximize tie density — the hard case for rank math
_matrix = st.tuples(
    st.integers(min_value=2, max_value=8), st.integers(min_value=1, max_value=3)
).flatmap(
    lambda dims: st.tuples(
        st.just(dims[0]),
        st.lists(
            st.lists(
                st.integers(min_value=-3, max_value=3),
                min_size=dims[1],
                max_size=dims[1],
            ),
            min_size=dims[0],
            max_size=dims[0],
        ),
        st.lists(
            st.integers(min_value=0, max_value=2), min_size=dims[0], max_size=dims[0]
        ),
    )
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_matrix)
def test_stats_match_numpy_oracle_on_random_matrices(spark, mv):
    _, rows, labels = mv
    data = np.asarray(rows, dtype=float)
    labels = np.asarray(labels)
    got = (
        feature_group_stats(spark.createDataFrame(fx.to_long(data, labels)))
        .toPandas()
        .set_index(["feature", "group"])
        .sort_index()
    )
    exp = full_oracle(data, labels)
    assert len(got) == len(exp)
    for (feat, grp), e in exp.items():
        row = got.loc[(feat, str(grp))]
        assert row["n1"] == e["n1"] and row["n2"] == e["n2"]
        assert row["rank_sum"] == e["rank_sum"]
        assert row["tie_term"] == e["tie_term"]
        assert row["u_stat"] == e["u"]
        if np.isnan(e["z"]) or np.isinf(e["z"]):
            assert np.isnan(row["z"]) or np.isinf(row["z"]) or row["z"] is None
        else:
            assert row["z"] == pytest.approx(e["z"], abs=1e-12)
            assert row["p_value"] == pytest.approx(e["p"], abs=1e-12)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=12,
    )
)
def test_bh_matches_oracle_on_random_pvalues(spark, pvals):
    df = spark.createDataFrame(
        [("g", f"f{i}", p) for i, p in enumerate(pvals)], "group string, feature string, p_value double"
    )
    got = (
        bh_adjust(df)
        .toPandas()
        .set_index("feature")["p_adjusted"]
        .sort_index()
    )
    exp = bh_oracle(np.asarray(pvals))
    for i, e in enumerate(exp):
        assert got[f"f{i}"] == pytest.approx(e, abs=1e-15)
