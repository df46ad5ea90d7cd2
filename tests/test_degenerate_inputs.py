"""Degenerate-input hardening: every major operator must survive an EMPTY
input (the first hour of any real backfill: a partition with no files, a
filter that matches nothing) and a single-row input, without crashing on
division-by-zero, empty windows, or empty aggregation edge cases.

A 100 TB pipeline is thousands of task-attempts; the empty slice is not a
corner case, it's Tuesday.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)
EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("label", T.LongType()),
    ]
)
EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


@pytest.fixture()
def one_doc(spark):
    return spark.createDataFrame(
        [(1, "one tiny document body here", "en", "s", 27)], DOC_SCHEMA
    )


def test_dedup_family_on_empty_and_single(spark, empty_docs, one_doc):
    from dask_mwu_spark.operators import dedup as dd

    for docs, expect_rows in ((empty_docs, 0), (one_doc, None)):
        assert dd.exact_dup_groups(docs).count() == (
            expect_rows if expect_rows is not None else 1
        )
        assert dd.minhash_lsh_pairs(docs).count() == 0  # no pairs either way
        assert dd.simhash_pairs(docs).count() == 0
        flags = dd.incremental_dedup_flags(
            docs, dd.minhash_band_keys(empty_docs)
        )
        assert flags.count() == (0 if expect_rows == 0 else 1)
        if expect_rows != 0:
            assert flags.collect()[0]["keep"] is True


def test_text_family_on_empty(spark, empty_docs):
    from dask_mwu_spark.operators import text as tx

    assert tx.text_stats(empty_docs).count() == 0
    assert tx.quality_scores(empty_docs).count() == 0
    assert tx.vocab_topk(empty_docs).count() == 0
    assert tx.tfidf_top_terms(empty_docs).count() == 0
    assert tx.heavy_hitters(empty_docs).count() == 0
    assert tx.winnow_fingerprints(empty_docs).count() == 0


def test_curation_family_on_empty(spark, empty_docs):
    from dask_mwu_spark.operators import curation as cur

    assert cur.classifier_score(empty_docs).count() == 0
    assert cur.repetition_signals(empty_docs).count() == 0
    assert cur.stratified_sample(empty_docs).count() == 0
    assert cur.curate(empty_docs).count() == 0
    funnel = cur.curation_funnel(empty_docs).collect()
    assert len(funnel) == 4  # report still renders; all-zero, no div/0
    assert all(r["n_in"] == 0 and r["drop_pct"] == 0.0 for r in funnel)


def test_similarity_family_on_empty(spark):
    from dask_mwu_spark.operators import similarity as sim

    emb = spark.createDataFrame([], EMB_SCHEMA)
    assert sim.cosine_topk(emb).count() == 0
    assert sim.lsh_cosine_topk(emb).count() == 0
    assert sim.dimension_stats(emb).count() == 0
    assert sim.embedding_dup_pairs(emb, tau=0.5).count() == 0


def test_events_family_on_empty(spark):
    from dask_mwu_spark.operators import events as ev_ops
    from dask_mwu_spark.operators.audit import key_skew_profile, value_histogram

    ev = spark.createDataFrame([], EV_SCHEMA)
    assert ev_ops.user_event_sequences(ev).count() == 0
    assert ev_ops.path_ngrams(ev).count() == 0
    assert ev_ops.cohort_retention(ev).count() == 0
    assert key_skew_profile(ev, "event_type").count() == 0
    assert value_histogram(ev, "value").count() == 0


def test_mwu_on_empty_measure(spark):
    from dask_mwu_spark.operators.mwu import (
        compute_in_group_ranksum,
        mann_whitney_u,
    )
    from dask_mwu_spark.operators.ranking import rank_values

    m = spark.createDataFrame(
        [], "feature string, group string, value double"
    )
    for kw in ({}, {"n_value_buckets": 8}):
        assert (
            mann_whitney_u(
                compute_in_group_ranksum(rank_values(m, **kw))
            ).count()
            == 0
        )


def test_bloom_on_empty_keys(spark):
    from dask_mwu_spark.operators.bloom import bloom_semi_join, build_bloom

    big = spark.range(100).select(F.col("id").alias("k"))
    none = spark.range(0).select(F.col("id").alias("k"))
    # empty key set -> empty bit table -> nothing passes, nothing crashes
    assert build_bloom(none, "k").count() == 0
    assert bloom_semi_join(big, none, on="k").count() == 0


def test_r5_family_on_empty(spark, empty_docs, one_doc):
    from dask_mwu_spark.operators.curation import (
        dsir_resample,
        dsir_weights,
        fuzzy_contamination,
    )
    from dask_mwu_spark.operators.text import gopher_rules

    assert gopher_rules(empty_docs).count() == 0
    # empty raw corpus (and empty target): no rows, no /0, no LN(0)
    assert dsir_weights(empty_docs, one_doc).count() == 0
    assert dsir_weights(one_doc, empty_docs).count() == 1
    assert dsir_resample(empty_docs, one_doc).count() == 0
    # empty eval set: no candidates, empty result — not an error
    assert fuzzy_contamination(one_doc, empty_docs).count() == 0
    assert fuzzy_contamination(empty_docs, one_doc).count() == 0


def test_r5_matryoshka_on_tiny(spark):
    import numpy as np
    import pandas as pd

    from dask_mwu_spark.operators.similarity import matryoshka_recall

    # fewer vectors than k: n_truth < n_queries*k, recall still defined
    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 64))
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(4),
                "embedding": [v.astype(np.float32).tolist() for v in base],
                "label": [0] * 4,
            }
        )
    )
    out = matryoshka_recall(emb, prefix_dims=(64,), n_queries=2, k=5).toPandas()
    assert out.iloc[0].n_truth == 6  # 2 queries x 3 candidates each
    assert out.iloc[0].recall == 1.0
