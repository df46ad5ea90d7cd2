"""Bloom pre-join pruning: no false negatives ever, bounded false
positives, exact composed results, and scan-stage (shuffle-free) pruning."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.operators.bloom import (
    BLOOM_K,
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)
from dask_mwu_spark.sources.loaders import load_table


def test_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = build_bloom(keys, "k")
    passed = {
        r["k"] for r in bloom_might_contain(keys, "k", bloom).collect()
    }
    assert passed == set(range(500))  # every inserted key must pass


def test_false_positive_rate_bounded(spark):
    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    probe = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    bloom = build_bloom(keys, "k")
    fp = bloom_might_contain(probe, "k", bloom).count()
    # n=200, m≈1e6, k=5 → theoretical fp ≈ 1e-15; allow generous slack
    assert fp <= 2


def test_small_filter_forces_fps_but_semi_join_exact(spark):
    """With a deliberately tiny filter the pruning stage lets false
    positives through — the confirm join must still produce the exact
    semi-join result."""
    big = spark.range(0, 5_000).select(F.col("id").alias("k"))
    keys = spark.range(0, 5_000, 17).select(F.col("id").alias("k"))
    tiny_m = 63 * 8  # 504 bits for ~300 keys → heavy FP load
    bloom = build_bloom(keys, "k", m_bits=tiny_m)
    pruned = bloom_might_contain(big, "k", bloom, m_bits=tiny_m).count()
    exact = big.join(keys, "k", "left_semi").count()
    assert pruned > exact  # the FPs are real, i.e. the test means something
    got = sorted(
        r["k"]
        for r in bloom_semi_join(big, keys, on="k", m_bits=tiny_m).collect()
    )
    assert got == list(range(0, 5_000, 17))


def test_composed_equals_plain_semi_join_on_tpch(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sel = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") >= 400000
    )
    got = (
        bloom_semi_join(li, sel, on="l_orderkey", key_col="o_orderkey")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = (
        li.join(
            sel.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
            "l_orderkey",
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_pruning_stage_is_shuffle_free(spark):
    """The might_contain stage must be broadcast joins only — no Exchange
    between the big-side scan and the filter predicate."""
    big = spark.range(0, 1_000).select(F.col("id").alias("k"))
    bloom = build_bloom(spark.range(0, 50).select(F.col("id").alias("k")), "k")
    df = bloom_might_contain(big, "k", bloom)
    df.collect()  # finalize the AQE plan so exchange reuse is visible
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # AQE toString appends the pre-AQE plan
    )
    assert plan.count("BroadcastHashJoin") == BLOOM_K
    # the bloom bit-table aggregation is built ONCE and its exchange reused
    # for the other k-1 joins; the big side itself is never shuffled —
    # exactly one real shuffle in the plan (the tiny bloom build)
    assert plan.count("ReusedExchange") == BLOOM_K - 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_runtime_bloom_filter_injection_at_scale(spark, sf_dir):
    """Spark's own runtime bloom filter (the optimizer path used when the
    key set is produced inside the same query) — force the size thresholds
    down and assert the filter is injected into the fact-side scan."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB"
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        sel = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") >= 400000
        )
        plan = (
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
