"""As-of join semantics: inclusive backward match, no-match NULLs,
tolerance, duplicate-right resolution."""

from dask_mwu_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_inclusive(spark):
    left = _df(spark, [(1, 10, "a"), (1, 20, "b"), (1, 5, "c")], "k long, t long, tag string")
    right = _df(spark, [(1, 10, 100.0), (1, 15, 150.0)], "k long, t long, v double")
    out = {
        r.tag: (r.asof_v, r.asof_ts)
        for r in asof_join(left, right, on="k", ts="t", payload_cols=["v"]).collect()
    }
    assert out["a"] == (100.0, 10)  # equal ts matches (inclusive)
    assert out["b"] == (150.0, 15)  # most recent prior
    assert out["c"] == (None, None)  # nothing at or before t=5


def test_asof_tolerance(spark):
    left = _df(spark, [(1, 100, "x"), (1, 200, "y")], "k long, t long, tag string")
    right = _df(spark, [(1, 95, 1.0)], "k long, t long, v double")
    out = {
        r.tag: r.asof_v
        for r in asof_join(
            left, right, on="k", ts="t", payload_cols=["v"], tolerance_us=10
        ).collect()
    }
    assert out["x"] == 1.0  # within 10
    assert out["y"] is None  # 105 > 10 behind


def test_asof_keys_do_not_leak(spark):
    left = _df(spark, [(1, 10, "a"), (2, 10, "b")], "k long, t long, tag string")
    right = _df(spark, [(1, 5, 7.0)], "k long, t long, v double")
    out = {
        r.tag: r.asof_v
        for r in asof_join(left, right, on="k", ts="t", payload_cols=["v"]).collect()
    }
    assert out["a"] == 7.0
    assert out["b"] is None  # other key's rows invisible


def test_asof_duplicate_right_ts_keeps_max_payload(spark):
    left = _df(spark, [(1, 10, "a")], "k long, t long, tag string")
    right = _df(
        spark, [(1, 10, 3.0), (1, 10, 9.0), (1, 10, 5.0)], "k long, t long, v double"
    )
    (row,) = asof_join(left, right, on="k", ts="t", payload_cols=["v"]).collect()
    assert row.asof_v == 9.0


def test_asof_row_count_preserved(spark, sf_dir):
    from dask_mwu_spark.sources.loaders import load_table
    from dask_mwu_spark.streaming.events import ts_us
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", ts_us("ts").alias("ts_us")
    )
    left = ev.where(F.col("event_type") == "purchase").drop("event_type")
    right = ev.where(F.col("event_type") == "click").select("user_id", "ts_us", "value")
    out = asof_join(left, right, on="user_id", ts="ts_us", payload_cols=["value"])
    assert out.count() == left.count()
