"""Range join: identical results to the naive inequality join, boundary
semantics, left mode, and a hash-join (not nested-loop) physical plan."""

import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.operators.interval import range_join


@pytest.fixture()
def bands(spark):
    return spark.createDataFrame(
        [(i, float(i * 10), float((i + 1) * 10)) for i in range(10)],
        "band long, lo double, hi double",
    )


def test_range_join_equals_naive(spark, bands):
    facts = spark.range(200).select(
        F.col("id").alias("fid"), (F.col("id") % 97).cast("double").alias("v")
    )
    naive = facts.join(
        bands, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    ).select("fid", "band")
    fast = range_join(
        facts, bands, value_col="v", bucket_width=25.0
    ).select("fid", "band")
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))


def test_range_join_boundaries(spark, bands):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 9.999999), (4, 100.0)], "fid long, v double"
    )
    got = {
        r.fid: r.band
        for r in range_join(facts, bands, value_col="v", bucket_width=10.0).collect()
    }
    assert got[1] == 0  # lo inclusive
    assert got[2] == 1  # hi exclusive: 10.0 belongs to [10, 20)
    assert got[3] == 0
    assert 4 not in got  # beyond all intervals


def test_range_join_left_keeps_unmatched(spark, bands):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 500.0)], "fid long, v double"
    )
    got = {
        r.fid: r.band
        for r in range_join(
            facts, bands, value_col="v", bucket_width=10.0, how="left"
        ).collect()
    }
    assert got[1] == 0 and got[2] is None


def test_range_join_plans_hash_join(spark, bands):
    facts = spark.range(1000).select(
        F.col("id").alias("fid"), (F.col("id") % 83).cast("double").alias("v")
    )
    joined = range_join(facts, bands, value_col="v", bucket_width=10.0)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    # overlapping-interval fan-out: a fact can match several intervals
    wide = spark.createDataFrame(
        [(0, 0.0, 100.0), (1, 40.0, 60.0)], "band long, lo double, hi double"
    )
    got = range_join(
        spark.createDataFrame([(1, 50.0)], "fid long, v double"),
        wide,
        value_col="v",
        bucket_width=10.0,
    )
    assert {r.band for r in got.collect()} == {0, 1}
