"""Bucketed storage: joins between co-bucketed tables must plan NO shuffle."""

import re

from pyspark.sql import functions as F

from dask_mwu_spark.sources.bucketed import read_table, write_bucketed_table


def _physical_plan(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_cobucketed_join_plans_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed_table(
        orders, "b_orders", bucket_cols=("o_orderkey",), n_buckets=8,
        sort_cols=("o_orderkey",),
    )
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", bucket_cols=("o_orderkey",), n_buckets=8,
        sort_cols=("o_orderkey",),
    )
    a = read_table(spark, "b_orders")
    b = read_table(spark, "b_lineitem")
    # force a sort-merge join so the test shows bucketing (not broadcast)
    joined = a.hint("merge").join(b, "o_orderkey")
    plan = _physical_plan(joined)
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in tree, tree
    # and the join result is correct
    n = joined.count()
    assert n == lineitem.count()  # every lineitem row has its order


def test_bucketed_aggregation_no_exchange(spark):
    a = read_table(spark, "b_lineitem")
    agg = a.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    tree = _physical_plan(agg).split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert agg.count() > 0
