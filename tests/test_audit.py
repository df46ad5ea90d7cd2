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
