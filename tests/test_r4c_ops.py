"""Round-4c operator semantics: bigram LM scoring, containment
verification, cross-table reconciliation, MAD outlier audit — hand-built
inputs with hand-computed expectations, plus partition-invariance for the
float-folding paths."""

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dask_mwu_spark.operators.audit import mad_outliers, reconcile_sum
from dask_mwu_spark.operators.dedup import containment_pairs
from dask_mwu_spark.operators.skew import salted_join
from dask_mwu_spark.operators.text import lm_bigram_score


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )


# ---------------------------------------------------------------------------
# lm_bigram_score
# ---------------------------------------------------------------------------


def test_lm_bigram_hand_computed(spark):
    # corpus: "a b a b" and "a b c": bigrams (a,b)x3? no: doc1 = a-b, b-a,
    # a-b; doc2 = a-b, b-c.  C(a,b)=3, C(b,a)=1, C(b,c)=1.
    # contexts: C(a.)=3, C(b.)=2.  V=3 (a,b,c).  alpha=0.5.
    docs = _docs(
        spark,
        [(1, "a b a b", "en", "s", 7), (2, "a b c", "en", "s", 5)],
    )
    out = lm_bigram_score(docs).toPandas().set_index("doc_id").sort_index()
    p_ab = (3 + 0.5) / (3 + 0.5 * 3)
    p_ba = (1 + 0.5) / (2 + 0.5 * 3)
    p_bc = (1 + 0.5) / (2 + 0.5 * 3)
    d1 = (math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    d2 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert out.loc[1, "n_bigrams"] == 3
    assert out.loc[2, "n_bigrams"] == 2
    assert abs(out.loc[1, "avg_logp"] - round(d1, 6)) < 1e-9
    assert abs(out.loc[2, "avg_logp"] - round(d2, 6)) < 1e-9
    assert abs(out.loc[1, "ppl_proxy"] - round(math.exp(-d1), 6)) < 1e-9


def test_lm_bigram_short_doc_null_scores(spark):
    docs = _docs(spark, [(1, "only", "en", "s", 4), (2, "a a", "en", "s", 3)])
    out = lm_bigram_score(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "n_bigrams"] == 0
    assert pd.isna(out.loc[1, "avg_logp"])
    assert out.loc[2, "n_bigrams"] == 1


def test_lm_bigram_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = lm_bigram_score(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        lm_bigram_score(docs.repartition(7, "source"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def test_containment_subset_doc(spark):
    # doc 2 is a strict prefix of doc 1: every 3-shingle of doc 2 appears
    # in doc 1 -> containment 1.0, jaccard < 1; doc 3 unrelated
    long = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    short = "x1 x2 x3 x4 x5 x6"
    docs = _docs(
        spark,
        [
            (1, long, "en", "s", len(long)),
            (2, short, "en", "s", len(short)),
            (3, "q r s t u v w", "en", "s", 13),
        ],
    )
    out = containment_pairs(docs, est_threshold=0.0, threshold=0.9).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert {row["doc_a"], row["doc_b"]} == {1, 2}
    assert row["containment"] == 1.0
    # |sh(long)|=8, |sh(short)|=4, inter=4 -> J = 4/8
    assert row["jaccard"] == 0.5


def test_containment_dominates_jaccard_and_threshold_filters(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    allp = containment_pairs(docs, est_threshold=0.25, threshold=0.0).toPandas()
    assert len(allp) > 0
    # max-containment >= Jaccard always (divides by min size, not union)
    assert (allp["containment"] >= allp["jaccard"]).all()
    assert (allp["containment"] <= 1.0).all()
    kept = containment_pairs(docs, est_threshold=0.25, threshold=0.9).toPandas()
    expect = allp[allp["containment"] >= 0.9]
    assert len(kept) == len(expect)


# ---------------------------------------------------------------------------
# reconcile_sum
# ---------------------------------------------------------------------------


def _reconcile_tables(spark):
    parent = spark.createDataFrame(
        pd.DataFrame(
            {
                "pk": [1, 2, 3],
                "total": [30.0, 100.0, 7.0],
                "grp": ["A", "A", "B"],
            }
        )
    )
    child = spark.createDataFrame(
        pd.DataFrame(
            {
                "ck": [1, 1, 2],
                "ln": [1, 2, 1],
                "amt": [10.0, 20.0, 99.5],
            }
        )
    )
    return parent, child


def test_reconcile_hand_computed(spark):
    parent, child = _reconcile_tables(spark)
    out = (
        reconcile_sum(
            parent,
            child,
            parent_key="pk",
            child_key="ck",
            parent_total="total",
            child_amount=F.col("amt"),
            child_order="ln",
            group_col="grp",
        )
        .toPandas()
        .set_index("grp")
        .sort_index()
    )
    # pk1: 10+20=30 exact match; pk2: 99.5 vs 100 -> gap 0.5, rel 0.005
    assert out.loc["A", "n_parents"] == 2
    assert out.loc["A", "n_matched"] == 1
    assert out.loc["A", "n_within_1pct"] == 2
    assert out.loc["A", "max_abs_gap"] == 0.5
    assert out.loc["A", "n_childless"] == 0
    # pk3 has no children: unmatched, gap = |0-7| = 7
    assert out.loc["B", "n_childless"] == 1
    assert out.loc["B", "n_matched"] == 0
    assert out.loc["B", "max_abs_gap"] == 7.0


def test_reconcile_fold_order_partition_invariant(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (
        1 + F.col("l_tax")
    )

    def run(li):
        return (
            reconcile_sum(
                orders,
                li,
                parent_key="o_orderkey",
                child_key="l_orderkey",
                parent_total="o_totalprice",
                child_amount=amount,
                child_order="l_linenumber",
                group_col="o_orderstatus",
            )
            .toPandas()
            .sort_values("o_orderstatus")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(lineitem), run(lineitem.repartition(13)))


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_hand_computed(spark):
    # group g: values 1..5 plus a wild 100 -> median 4.5? no:
    # [1,2,3,4,5,100]: median = (3+4)/2 = 3.5; devs = [2.5,1.5,0.5,0.5,
    # 1.5,96.5]; MAD = median(devs) = 1.5; cutoff 4.4478*1.5 = 6.6717
    # -> only 96.5 exceeds it
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["g"] * 6, "v": [1.0, 2.0, 3.0, 4.0, 5.0, 100.0]})
    )
    out = mad_outliers(df, "v", ["g"]).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n"] == 6
    assert row["median"] == 3.5
    assert row["mad"] == 1.5
    assert row["n_outliers"] == 1


def test_mad_constant_group_no_outliers(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 4, "v": [7.0, 7.0, 7.0, 7.0]})
    )
    out = mad_outliers(df, "v", ["g"]).toPandas().iloc[0]
    assert out["median"] == 7.0 and out["mad"] == 0.0 and out["n_outliers"] == 0


def test_mad_histogram_equals_percentile_method(spark, sf_dir):
    """VERDICT r4 item 4: the bounded-state histogram default must be
    bit-identical to the single-buffer F.percentile path (both interpolate
    with Spark Percentile's (hi-pos)*v0+(pos-lo)*v1 form) — on real data
    with ties, even group sizes, and heavy tails."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    )
    a = (
        mad_outliers(ev, "value", ["event_type"], method="histogram")
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    b = (
        mad_outliers(ev, "value", ["event_type"], method="percentile")
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_mad_rejects_unknown_method(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["a"], "v": [1.0]}))
    with pytest.raises(ValueError, match="histogram|percentile"):
        mad_outliers(df, "v", ["g"], method="approx")


# ---------------------------------------------------------------------------
# salted join query shape (row-identity is covered in test_skew; here the
# registered summary must equal the plain-join summary)
# ---------------------------------------------------------------------------


def test_salted_join_summary_matches_plain(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    dim = ev.groupBy("event_type").agg(
        F.max("value").alias("vmax"), F.count(F.lit(1)).alias("n_type")
    )

    def summarize(joined):
        return (
            joined.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((F.col("value") > F.col("vmax") / 2).cast("long")).alias(
                    "n_above_half"
                ),
            )
            .toPandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )

    plain = summarize(ev.join(dim, "event_type"))
    salted = summarize(salted_join(ev, dim, on=["event_type"], n_salts=8))
    pd.testing.assert_frame_equal(plain, salted)


# ---------------------------------------------------------------------------
# evaluation harnesses
# ---------------------------------------------------------------------------


def test_lsh_recall_on_exact_dups(spark):
    # five identical docs + noise: truth = C(5,2)=10 pairs at J=1.0, and
    # identical MinHash signatures make every one an LSH candidate
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [(i, base, "en", "s", len(base)) for i in range(5)]
    rows += [(10 + i, f"u{i} v{i} x{i} y{i} z{i} q{i}", "en", "s", 20) for i in range(5)]
    from dask_mwu_spark.operators.dedup import lsh_recall_eval

    out = lsh_recall_eval(_docs(spark, rows)).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_truth"] == 10
    assert row["n_hit"] == 10
    assert row["recall"] == 1.0


def test_lsh_recall_bounds_on_corpus(spark, sf_dir):
    from dask_mwu_spark.operators.dedup import lsh_recall_eval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = lsh_recall_eval(docs).toPandas().iloc[0]
    assert row["n_hit"] <= row["n_truth"]
    assert row["n_hit"] <= row["n_candidates"]
    assert 0.0 <= row["recall"] <= 1.0
    assert 0.0 <= row["precision"] <= 1.0


def test_ann_recall_shape_and_bounds(spark, sf_dir):
    from dask_mwu_spark.operators.similarity import ann_recall_eval

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann_recall_eval(emb, n_queries=10, k=5).toPandas()
    assert len(out) == 10
    assert (out["n_truth"] == 5).all()
    assert (out["n_hit"] <= out["n_truth"]).all()
    assert (out["n_hit"] <= out["n_approx"]).all()
    assert ((out["recall"] >= 0.0) & (out["recall"] <= 1.0)).all()


# ---------------------------------------------------------------------------
# markov_transitions
# ---------------------------------------------------------------------------


def test_markov_hand_computed(spark):
    from dask_mwu_spark.operators.events import markov_transitions

    # user 1: A(t1) -> B(t2) -> A(t3); user 2: A(t1) -> B(t2)
    # transitions: A->B x2, B->A x1; n_from: A=2, B=1
    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_id": [1, 2, 3, 4, 5],
            "ts": [10, 20, 30, 10, 20],
            "event_type": ["A", "B", "A", "A", "B"],
        }
    )
    out = (
        markov_transitions(spark.createDataFrame(rows))
        .toPandas()
        .set_index(["from_type", "to_type"])
        .sort_index()
    )
    assert out.loc[("A", "B"), "n_transitions"] == 2
    assert out.loc[("A", "B"), "n_from"] == 2
    assert out.loc[("A", "B"), "p"] == 1.0
    assert out.loc[("B", "A"), "n_transitions"] == 1
    assert out.loc[("B", "A"), "p"] == 1.0
    assert len(out) == 2


def test_markov_rows_sum_to_one(spark, sf_dir):
    from dask_mwu_spark.operators.events import markov_transitions
    from dask_mwu_spark.sources.loaders import load_table

    ev = load_table(spark, sf_dir, "events")
    out = markov_transitions(ev).toPandas()
    sums = out.groupby("from_type")["n_transitions"].sum()
    totals = out.groupby("from_type")["n_from"].first()
    assert (sums == totals).all()


# ---------------------------------------------------------------------------
# benford_profile
# ---------------------------------------------------------------------------


def test_benford_hand_computed(spark):
    from dask_mwu_spark.operators.audit import benford_profile

    # cents: 123, 1999, 205, 0 (dropped), -5 (dropped), null (dropped)
    df = spark.createDataFrame(
        pd.DataFrame({"v": [1.23, 19.99, 2.05, 0.0, -0.05, None]})
    )
    out = benford_profile(df, "v").toPandas().set_index("digit").sort_index()
    assert out["n"].sum() == 3
    assert out.loc[1, "n"] == 2  # 123, 1999
    assert out.loc[2, "n"] == 1  # 205
    assert abs(out.loc[1, "expected_freq"] - round(math.log10(2.0), 6)) < 1e-9
    assert abs(out.loc[1, "freq"] - round(2 / 3, 6)) < 1e-9


def test_benford_power_of_ten_boundary(spark):
    from dask_mwu_spark.operators.audit import benford_profile

    # exactly 10.00 and 100.00: float-log10 digit extraction can land on
    # 9 or 1 depending on the engine's ulp; integer cents cannot
    df = spark.createDataFrame(pd.DataFrame({"v": [10.0, 100.0, 1000.0]}))
    out = benford_profile(df, "v").toPandas()
    assert len(out) == 1
    assert out.iloc[0]["digit"] == 1 and out.iloc[0]["n"] == 3


# ---------------------------------------------------------------------------
# rfm_scores
# ---------------------------------------------------------------------------


def test_rfm_hand_computed(spark):
    from dask_mwu_spark.operators.rfm import rfm_scores

    # 4 customers; last order dates 0/1/2/3 days before the global max
    rows = pd.DataFrame(
        {
            "o_custkey": [1, 1, 2, 3, 4],
            "o_orderkey": [10, 11, 20, 30, 40],
            "o_orderdate": pd.to_datetime(
                ["2024-01-04", "2024-01-01", "2024-01-03", "2024-01-02", "2024-01-01"]
            ),
            "o_totalprice": [100.0, 50.0, 10.0, 20.0, 30.0],
        }
    )
    out = (
        rfm_scores(spark.createDataFrame(rows))
        .toPandas()
        .set_index("customer")
        .sort_index()
    )
    assert out.loc[1, "recency_days"] == 0
    assert out.loc[4, "recency_days"] == 3
    assert out.loc[1, "frequency"] == 2
    assert out.loc[1, "monetary"] == 150.0
    # customer 1 has the max of everything except recency -> m/f scores 4
    assert out.loc[1, "m_score"] == 4
    assert out.loc[1, "f_score"] == 4
    assert out.loc[1, "r_score"] == 1
    # scores stay in 1..4
    for c in ("r_score", "f_score", "m_score"):
        assert out[c].between(1, 4).all()


def test_rfm_partition_invariant(spark, sf_dir):
    from dask_mwu_spark.operators.rfm import rfm_scores

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = rfm_scores(orders).toPandas().sort_values("customer").reset_index(drop=True)
    b = (
        rfm_scores(orders.repartition(11))
        .toPandas()
        .sort_values("customer")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# cluster_quality
# ---------------------------------------------------------------------------


def test_cluster_quality_shares_and_bounds(spark, sf_dir):
    from dask_mwu_spark.operators.similarity import cluster_quality

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cluster_quality(emb).toPandas()
    assert abs(out["share"].sum() - 1.0) < 1e-4
    assert (out["mean_cos"] >= out["min_cos"]).all()
    assert (out["mean_cos"] <= 1.0).all()
    assert out["n_vectors"].sum() > 0


def test_cluster_quality_centroid_members_score_one(spark, sf_dir):
    from dask_mwu_spark.operators.similarity import cluster_quality, ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # each seed centroid is its own nearest centroid with cosine 1.0, so
    # every cluster with its seed present has max member cos = 1.0 ->
    # mean_cos of a singleton seed cluster is exactly 1.0
    idx = ivf_index(emb).toPandas()
    seeds = idx[idx["vec_id"] < 16]
    assert (seeds["vec_id"] == seeds["cent_id"]).all()


# ---------------------------------------------------------------------------
# exact_quantile_by_group
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("q", [0.0, 0.1, 0.5, 0.75, 1.0])
def test_grouped_quantile_matches_percentile(spark, q):
    from dask_mwu_spark.operators.audit import exact_quantile_by_group

    rows = pd.DataFrame(
        {
            "g": ["a"] * 7 + ["b"] + ["c", "c"] + ["d"] * 5,
            "v": [5.0, 5.0, 5.0, 1.0, 2.0, 9.0, 9.0, 3.25, -1.5, 4.5]
            + [0.0] * 5,
        }
    )
    df = spark.createDataFrame(rows)
    a = (
        exact_quantile_by_group(df, "v", q, ["g"])
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    b = (
        df.groupBy("g")
        .agg(F.percentile(F.col("v").cast("double"), F.lit(q)).alias("quantile"))
        .toPandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert (a["quantile"].to_numpy() == b["quantile"].to_numpy()).all()


def test_grouped_quantile_narrowing_actually_engages(spark, sf_dir):
    from dask_mwu_spark.operators.audit import exact_quantile_by_group
    from dask_mwu_spark.sources.loaders import load_table

    # tiny n_bins forces multiple narrowing rounds; result must still be
    # bit-identical to the single-buffer percentile
    ev = load_table(spark, sf_dir, "events")
    a = (
        exact_quantile_by_group(ev, "value", 0.5, ["event_type"], n_bins=4)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    b = (
        ev.groupBy("event_type")
        .agg(F.percentile(F.col("value").cast("double"), F.lit(0.5)).alias("quantile"))
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert (a["quantile"].to_numpy() == b["quantile"].to_numpy()).all()


# ---------------------------------------------------------------------------
# argmin star join + stickiness (query-level compositions)
# ---------------------------------------------------------------------------


def test_cheapest_supplier_argmin_is_map_side(spark, sf_dir):
    import extensions_entry as ee

    out = ee.extension_queries()["part_cheapest_supplier"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the argmin must be a partial-aggregable min(struct), never a
    # per-part window sort
    assert "Window" not in plan
    df = out.toPandas()
    assert df["p_partkey"].is_unique
    assert (df["n_offers"] >= 1).all()


def test_stickiness_bounds(spark, sf_dir):
    import extensions_entry as ee

    df = ee.extension_queries()["events_stickiness"](spark, sf_dir).toPandas()
    assert ((df["stickiness"] > 0) & (df["stickiness"] <= 1.0)).all()
    assert (df["dau"] <= df["mau"]).all()


def test_local_supplier_volume_dims_broadcast(spark, sf_dir):
    import extensions_entry as ee

    out = ee.extension_queries()["star_local_supplier_volume"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every dimension side is a broadcast join; no cartesian anywhere
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    df = out.toPandas()
    assert (df["revenue"] > 0).all() and df["nation"].is_unique
