"""Audit-operator semantics on hand-built tables."""

import pandas as pd

from dask_mwu_spark.operators.audit import null_profile, orphans, uniqueness


def test_null_profile_counts_per_column(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"a": [1, None, 3], "b": [None, None, "x"]})
    )
    got = null_profile(df).toPandas().set_index("column")
    assert got.loc["a"].n_nulls == 1
    assert got.loc["b"].n_nulls == 2
    assert (got.n_rows == 3).all()
    # single-job contract: the plan has exactly one aggregate pass
    plan = null_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4, plan  # partial+final, no per-col jobs


def test_uniqueness_counts_duplicates(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2, 3], "v": list("abcde")})
    )
    row = uniqueness(df, ["k"]).collect()[0]
    assert (row.n_rows, row.n_distinct_keys, row.n_dup_rows) == (5, 3, 2)


def test_orphans_left_anti(spark):
    child = spark.createDataFrame(pd.DataFrame({"fk": [1, 2, 9, 9]}))
    parent = spark.createDataFrame(pd.DataFrame({"pk": [1, 2, 3]}))
    got = orphans(child, parent, child_key="fk", parent_key="pk").toPandas()
    assert list(got.fk) == [9, 9]


def test_key_skew_profile_values_and_plan(spark):
    import pandas as pd
    from dask_mwu_spark.operators.audit import key_skew_profile

    df = spark.createDataFrame(
        pd.DataFrame({"k": ["hot"] * 80 + ["warm"] * 15 + ["cold"] * 5})
    )
    prof = key_skew_profile(df, "k", top_k=2)
    rows = {r["key_value"]: r.asDict() for r in prof.collect()}
    assert list(rows) == ["hot", "warm"]  # ordered by weight, k=2
    assert rows["hot"]["n_rows"] == 80 and rows["hot"]["share"] == 0.8
    # 3 keys, uniform share would be 1/3 of 100 rows: hot is 2.4x that
    assert rows["hot"]["skew_vs_uniform"] == 2.4
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_value_histogram_bins(spark):
    import pandas as pd
    from dask_mwu_spark.operators.audit import value_histogram

    df = spark.createDataFrame(
        pd.DataFrame({"v": [0.0, 1.0, 2.5, 5.0, 7.5, 10.0, 10.0]})
    )
    hist = {r["bin"]: r.asDict() for r in value_histogram(df, "v", n_bins=4).collect()}
    # range [0,10], width 2.5; max closes into the last bin
    assert hist[1]["n_rows"] == 2      # 0.0, 1.0
    assert hist[2]["n_rows"] == 1      # 2.5
    assert hist[3]["n_rows"] == 1      # 5.0
    assert hist[4]["n_rows"] == 3      # 7.5, 10.0, 10.0
    assert hist[1]["lo"] == 0.0 and hist[4]["hi"] == 10.0
    assert sum(h["n_rows"] for h in hist.values()) == 7


def test_value_histogram_constant_column(spark):
    import pandas as pd
    from dask_mwu_spark.operators.audit import value_histogram

    df = spark.createDataFrame(pd.DataFrame({"v": [3.0] * 5}))
    rows = value_histogram(df, "v", n_bins=10).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 1 and rows[0]["n_rows"] == 5


def test_correlation_matrix_single_pass(spark):
    import pandas as pd
    from dask_mwu_spark.operators.audit import correlation_matrix

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [1.0, 2.0, 3.0, 4.0],
                "b": [2.0, 4.0, 6.0, 8.0],     # perfectly correlated with a
                "c": [4.0, 3.0, 2.0, 1.0],     # perfectly anti-correlated
            }
        )
    )
    out = {(r["col_a"], r["col_b"]): r["corr"] for r in
           correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0
    assert len(out) == 3  # upper triangle only
    # one pass: a single aggregate node, no join, no shuffle beyond the agg
    plan = correlation_matrix(df, ["a", "b", "c"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan


def test_exact_quantile_matches_percentile(spark):
    """Histogram-narrowed exact quantile == F.percentile bit-for-bit across
    distributions that stress the narrowing: uniform, heavy ties, extreme
    skew, negatives, tiny n."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_mwu_spark.operators.audit import exact_quantile

    rng = np.random.default_rng(11)
    cases = {
        "uniform": rng.uniform(0, 1, 5000),
        "ties": np.repeat([1.0, 2.0, 2.0, 3.0], 1000)[rng.permutation(4000)],
        "one_value": np.full(777, 42.5),
        "skew": np.exp(rng.normal(0, 5, 3000)),
        "negatives": rng.normal(-1e6, 1e3, 2000),
        "tiny": np.array([3.0, 1.0]),
        "single": np.array([9.25]),
    }
    for name, arr in cases.items():
        df = spark.createDataFrame([(float(x),) for x in arr], "v: double")
        for q in (0.0, 0.25, 0.5, 0.9, 1.0):
            want = df.agg(F.percentile("v", F.lit(q))).first()[0]
            got = exact_quantile(df, "v", q, n_bins=16, max_rounds=6)
            assert got == want, (name, q, got, want)


def test_exact_quantile_adversarial_ties_cap(spark):
    """Planted adversarial distribution for the tie-bail (VERDICT r11):
    a massive tie at the low edge holds rank k0 while high-cardinality
    mass spreads to the high edge, so joint narrowing stalls ("ties
    span the range") with MANY distinct values still in range.  The
    enforced distinct-count cap must trip and the F.percentile
    fallback must return the exact same bits."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_mwu_spark.operators.audit import exact_quantile

    rng = np.random.default_rng(12)
    # 2000 zeros + 2000 distinct values packed into the top histogram
    # bin of [0, 1] (with n_bins=16 every positive value lands in the
    # last bin, ranks k0/k1 straddle bin 0 and bin 15 -> no narrowing)
    arr = np.concatenate(
        [np.zeros(2000), 1.0 - rng.uniform(0, 1.0 / 32.0, 2000)]
    )
    df = spark.createDataFrame([(float(x),) for x in arr], "v: double")
    # q placing k0 on the last zero and k1 on the first positive value
    for q in (0.4999, 0.5, 0.5002, 0.75):
        want = df.agg(F.percentile("v", F.lit(q))).first()[0]
        # cap = 4*n_bins = 64 << 2000 distinct -> fallback path runs
        got = exact_quantile(df, "v", q, n_bins=16, max_rounds=6)
        assert got == want, (q, got, want)


def test_exact_quantile_empty_and_null(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from dask_mwu_spark.operators.audit import exact_quantile

    empty = spark.createDataFrame([], "v: double")
    assert exact_quantile(empty, "v", 0.5) is None
    nulls = spark.createDataFrame([(None,), (None,)], "v: double")
    assert exact_quantile(nulls, "v", 0.5) is None


def test_chi2_independence_hand_computed(spark):
    # 3x2 table with known counts: chi2 computed by hand with numpy
    import numpy as np
    import pandas as pd

    from dask_mwu_spark.operators.audit import chi2_independence

    counts = {("A", "F"): 20, ("A", "O"): 10, ("N", "F"): 15,
              ("N", "O"): 15, ("R", "F"): 5, ("R", "O"): 25}
    rows = [(a, b) for (a, b), n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["x", "y"]))
    out = chi2_independence(df, "x", "y").toPandas().iloc[0]

    obs = np.array([[20, 10], [15, 15], [5, 25]], dtype=float)
    ra = obs.sum(axis=1, keepdims=True)
    cb = obs.sum(axis=0, keepdims=True)
    g = obs.sum()
    e = ra * cb / g
    chi2 = ((obs - e) ** 2 / e).sum()
    assert out.n_obs == 90 and out.n_a == 3 and out.n_b == 2
    assert out.dof == 2
    assert abs(out.chi2 - chi2) < 1e-6
    assert out.p_value == round(float(np.exp(-out.chi2 / 2)), 6)


def test_chi2_independence_empty_cell(spark):
    # ADVICE r5 (medium): a pair (a, b) that never co-occurs still owes
    # its Pearson contribution (0 - e)^2 / e = e.  3x2 table with the
    # (R, O) cell EMPTY — compare against the full-frame numpy
    # computation (scipy.chi2_contingency semantics), which the old
    # observed-cells-only fold understated by exactly e_RO.
    import numpy as np
    import pandas as pd

    from dask_mwu_spark.operators.audit import chi2_independence

    counts = {("A", "F"): 20, ("A", "O"): 10, ("N", "F"): 15,
              ("N", "O"): 15, ("R", "F"): 30}  # (R, O) absent
    rows = [(a, b) for (a, b), n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["x", "y"]))
    out = chi2_independence(df, "x", "y").toPandas().iloc[0]

    obs = np.array([[20, 10], [15, 15], [30, 0]], dtype=float)
    ra = obs.sum(axis=1, keepdims=True)
    cb = obs.sum(axis=0, keepdims=True)
    g = obs.sum()
    e = ra * cb / g
    chi2_full = ((obs - e) ** 2 / e).sum()  # includes the empty cell
    assert out.n_obs == 90 and out.n_a == 3 and out.n_b == 2
    assert abs(out.chi2 - chi2_full) < 1e-6
    # and the understated (observed-only) value would have been wrong
    # by e_RO = 30 * 25 / 90 — make sure we are NOT computing that
    chi2_observed_only = chi2_full - e[2, 1]
    assert abs(out.chi2 - chi2_observed_only) > 1.0


def test_chi2_independence_dof1_p_null(spark):
    import pandas as pd

    from dask_mwu_spark.operators.audit import chi2_independence

    rows = [("A", "F")] * 3 + [("A", "O")] * 2 + [("B", "F")] * 4 + [("B", "O")] * 6
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["x", "y"]))
    out = chi2_independence(df, "x", "y").toPandas().iloc[0]
    assert out.dof == 1
    assert out.p_value is None or out.p_value != out.p_value  # NULL/NaN


def test_ks_two_sample_hand_computed(spark):
    import numpy as np
    import pandas as pd

    from dask_mwu_spark.operators.audit import ks_two_sample

    ga = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    gb = [4.0, 5.0, 6.0, 7.0, 8.0]
    rows = [("f", "a", v) for v in ga] + [("f", "b", v) for v in gb]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["feature", "group", "value"])
    )
    out = ks_two_sample(df, "a", "b").toPandas().iloc[0]
    # hand CDF walk over sorted distinct values
    vals = sorted(set(ga + gb))
    d_exp = max(
        abs(
            sum(v <= x for v in ga) / len(ga)
            - sum(v <= x for v in gb) / len(gb)
        )
        for x in vals
    )
    assert out.n1 == 6 and out.n2 == 5
    assert out.d_stat == round(d_exp, 6)
    ne = 6 * 5 / 11
    lam = round((np.sqrt(ne) + 0.12 + 0.11 / np.sqrt(ne)) * d_exp, 6)
    series = sum(
        (-1) ** (k - 1) * np.exp(-2 * k * k * lam * lam) for k in range(1, 9)
    )
    assert out.p_value == round(min(1.0, max(0.0, 2 * series)), 6)


def test_ks_identical_samples_d_zero(spark):
    import pandas as pd

    from dask_mwu_spark.operators.audit import ks_two_sample

    vals = [1.0, 2.0, 2.0, 3.0]
    rows = [("f", g, v) for g in ["a", "b"] for v in vals]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["feature", "group", "value"])
    )
    out = ks_two_sample(df, "a", "b").toPandas().iloc[0]
    assert out.d_stat == 0.0
    assert out.p_value == 1.0


def test_ks_disjoint_samples_d_one(spark):
    import pandas as pd

    from dask_mwu_spark.operators.audit import ks_two_sample

    rows = [("f", "a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8]] + [
        ("f", "b", float(v)) for v in [11, 12, 13, 14, 15, 16, 17, 18]
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["feature", "group", "value"])
    )
    out = ks_two_sample(df, "a", "b").toPandas().iloc[0]
    assert out.d_stat == 1.0
    assert out.p_value < 0.01
