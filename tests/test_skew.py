"""Skew mitigation: salted join / two-phase agg must be result-identical to
the plain formulations while spreading hot keys."""

from pyspark.sql import functions as F

from dask_mwu_spark.operators.skew import salted_join, two_phase_agg


def _skewed_df(spark, n=10000):
    # 90% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id") % 50)
        ).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed_df(spark)
    dim = spark.range(60).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        F.col("id").alias("dim_val"),
    ).union(spark.sql("SELECT 'hot' AS k, -1 AS dim_val"))
    plain = big.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.min("dim_val").alias("d")
    )
    salted = salted_join(big, dim, ["k"], n_salts=4).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.min("dim_val").alias("d")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_outer_modes(spark):
    big = _skewed_df(spark, n=1000)
    dim = spark.createDataFrame([("hot", 1)], "k string, dim_val int")
    left = salted_join(big, dim, ["k"], n_salts=4, how="left")
    assert left.count() == 1000
    assert left.where(F.col("dim_val").isNull()).count() == big.where(F.col("k") != "hot").count()


def test_two_phase_agg_equals_plain_agg(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count("v").alias("count_v"),
        F.max("v").alias("max_v"),
    )
    two = two_phase_agg(df, ["k"], {"v": "sum"}, n_salts=4).withColumnRenamed(
        "sum_v", "sum_v"
    )
    got = {r.k: r.sum_v for r in two.collect()}
    want = {r.k: r.sum_v for r in plain.collect()}
    assert got == want
    # min/max/count merge correctly too
    two_all = two_phase_agg(df, ["k"], {"v": "max"}, n_salts=4)
    assert {r.k: r.max_v for r in two_all.collect()} == {
        r.k: r.max_v for r in plain.collect()
    }
