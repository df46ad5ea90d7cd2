"""Curation operator semantics on hand-built corpora."""

import pandas as pd

from dask_mwu_spark.operators.curation import (
    contamination,
    curate,
    decontaminate,
    hash_split,
    purge_near_dups,
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )


def test_contamination_flags_shared_ngram(spark):
    train = _docs(
        spark,
        [
            (10, "the quick brown fox jumps high", "en", "s", 30),
            (11, "completely unrelated spark engine text", "en", "s", 38),
        ],
    )
    ev = _docs(spark, [(0, "quick brown fox runs away", "en", "s", 25)])
    got = contamination(train, ev).toPandas()
    # train doc 10 shares the 3-gram "quick brown fox"; doc 11 shares none
    assert list(got.doc_id) == [10]
    assert got.iloc[0].n_shared_shingles == 1
    survivors = decontaminate(train, ev).toPandas()
    assert sorted(survivors.doc_id) == [11]


def test_hash_split_is_deterministic_partition(spark):
    docs = _docs(
        spark, [(i, f"text {i}", "en", "s", 10) for i in range(2000)]
    )
    a = hash_split(docs).toPandas().set_index("doc_id").split
    b = hash_split(docs).toPandas().set_index("doc_id").split
    assert (a == b).all()  # deterministic
    counts = a.value_counts()
    assert set(counts.index) <= {"train", "val", "test"}
    # ~90/5/5 with slack for a 2000-doc sample
    assert 0.85 <= counts.get("train", 0) / 2000 <= 0.95
    # subset invariance: a doc's split is independent of the rest of the set
    sub = hash_split(
        _docs(spark, [(7, "text 7", "en", "s", 10)])
    ).toPandas().iloc[0]
    assert sub.split == a.loc[7]


def test_hash_split_respects_custom_weights(spark):
    docs = _docs(spark, [(i, "x", "en", "s", 1) for i in range(500)])
    out = hash_split(docs, weights={"a": 1.0, "b": 0.0}).toPandas()
    # all mass in 'a' except the zero-width tail bucket boundary
    assert (out.split == "a").all()


def test_repetition_signals_hand_computed(spark):
    out = (
        repetition_signals(_docs(spark, [(0, "a a a b", "en", "s", 7)]))
        .toPandas()
        .iloc[0]
    )
    assert out.n_tokens == 4
    assert out.top_word_frac == 0.75
    # bigrams: "a a", "a a", "a b" -> 3 total, 2 distinct
    assert out.dup_bigram_frac == round(1 - 2 / 3, 6)


def test_purge_near_dups_keeps_component_minimum(spark):
    docs = _docs(
        spark, [(i, f"doc {i}", "en", "s", 5) for i in range(5)]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    got = sorted(purge_near_dups(docs, pairs).toPandas().doc_id)
    # cluster {1,2,3} -> keep 1; docs 0 and 4 untouched
    assert got == [0, 1, 4]


def test_curate_drops_dup_lowq_and_mislabeled(spark):
    rich = "the fast row runs past the slow row and the data table"
    docs = _docs(
        spark,
        [
            (0, rich, "en", "s", len(rich)),
            (1, rich, "en", "s", len(rich)),  # exact dup -> dropped
            (2, "!!! ??? ;;; ,,,", "en", "s", 15),  # low quality -> dropped
            (3, rich, "fr", "s", len(rich)),  # en-looking text labeled fr
        ],
    )
    got = curate(
        docs, min_quality=0.5, max_top_word_frac=0.3, require_lang_match=True
    ).toPandas()
    assert sorted(got.doc_id) == [0]
    assert "quality" in got.columns
    # default cap 0.2 also drops doc 0 ("the" = 3/12 = 0.25 of tokens)
    assert curate(docs).count() == 0


def test_pack_sequences_concat_and_chunk(spark):
    from dask_mwu_spark.operators.curation import pack_sequences, pack_stats

    # one shard (n_shards=1): docs of 3,4,5,6 tokens, max_tokens=8
    # offsets 0,3,7,12 -> packs 0,0,0,1
    docs = _docs(
        spark,
        [
            (0, "a b c", "en", "s", 5),
            (1, "d e f g", "en", "s", 7),
            (2, "h i j k l", "en", "s", 9),
            (3, "m n o p q r", "en", "s", 11),
        ],
    )
    got = (
        pack_sequences(docs, max_tokens=8, n_shards=1)
        .select("doc_id", "n_tokens", "start_offset", "pack")
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(got.n_tokens) == [3, 4, 5, 6]
    assert list(got.start_offset) == [0, 3, 7, 12]
    assert list(got.pack) == [0, 0, 0, 1]
    stats = pack_stats(docs, max_tokens=8, n_shards=1).toPandas()
    assert sorted(map(tuple, stats.values.tolist())) == [
        (0, 0, 3, 12),
        (0, 1, 1, 6),
    ]


def test_pack_sequences_sharding_is_independent(spark):
    from dask_mwu_spark.operators.curation import pack_sequences

    docs = _docs(spark, [(i, "w " * 9 + "w", "en", "s", 19) for i in range(40)])
    got = pack_sequences(docs, max_tokens=25, n_shards=4).toPandas()
    # shard = doc_id % 4; within a shard every doc has 10 tokens, so doc
    # rank r in the shard starts at 10r -> pack = 10r // 25
    for _, row in got.iterrows():
        r = row.doc_id // 4  # rank of this doc within its shard
        assert row.shard == row.doc_id % 4
        assert row.start_offset == 10 * r
        assert row.pack == (10 * r) // 25


def test_sample_mixture_rates_and_determinism(spark):
    from dask_mwu_spark.operators.curation import sample_mixture

    docs = _docs(
        spark,
        [(i, "x", "a" if i % 2 == 0 else "b", "src", 1) for i in range(2000)],
    )
    docs = docs.withColumnRenamed("lang", "mix_src")
    # rates keyed on the source column; here use lang as the source col
    out = sample_mixture(
        docs, {"a": 1.0, "b": 0.25}, source_col="mix_src"
    ).toPandas()
    n_a = (out.mix_src == "a").sum()
    n_b = (out.mix_src == "b").sum()
    assert n_a == 1000  # rate 1.0 keeps everything
    assert 150 <= n_b <= 350  # ~25% of 1000
    again = sample_mixture(
        docs, {"a": 1.0, "b": 0.25}, source_col="mix_src"
    ).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)  # deterministic
    # rate 0 drops the source entirely
    none = sample_mixture(docs, {"a": 0.0, "b": 0.0}, source_col="mix_src")
    assert none.count() == 0


def test_classifier_score_matches_numpy_oracle(spark):
    """Hashed-linear-model scoring vs a from-scratch numpy/hashlib oracle."""
    import hashlib
    import math

    from dask_mwu_spark.operators.curation import classifier_score, clf_weights

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
        (1, "spark engines shuffle data across the cluster", "en", "s", 45),
        (2, "one", "en", "s", 3),
    ]
    got = (
        classifier_score(_docs(spark, rows))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    w = clf_weights()
    for doc_id, text, *_ in rows:
        toks = text.split(" ")
        wsum = 0
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % len(w)
            wsum += w[b]
        z = 0.1 + wsum / (1_000_000.0 * len(toks))
        want = round(1.0 / (1.0 + math.exp(-z)), 6)
        assert got.loc[doc_id].clf_score == want
        assert got.loc[doc_id].n_tokens == len(toks)
        assert bool(got.loc[doc_id].keep) == (want >= 0.5)


def test_classifier_score_custom_weights_and_threshold(spark):
    from dask_mwu_spark.operators.curation import classifier_score

    rows = [(0, "a b", "en", "s", 3)]
    # all-zero weights -> z = bias -> sigmoid(0.1) ~ 0.524979
    got = classifier_score(
        _docs(spark, rows), weights=[0] * 8, threshold=0.6
    ).toPandas()
    assert got.iloc[0].clf_score == 0.524979
    assert not got.iloc[0].keep


def test_stratified_sample_exact_k_and_deterministic(spark):
    from dask_mwu_spark.operators.curation import stratified_sample

    rows = [(i, f"text {i}", "en", "src%d" % (i % 3), 10) for i in range(300)]
    a = stratified_sample(_docs(spark, rows), k=7).toPandas()
    b = stratified_sample(_docs(spark, rows), k=7).toPandas()
    assert a.groupby("source").size().tolist() == [7, 7, 7]
    assert sorted(a.doc_id) == sorted(b.doc_id)  # deterministic
    # sample of a subset stays inside the sample rank order: k smaller -> subset
    small = stratified_sample(_docs(spark, rows), k=3).toPandas()
    assert set(small.doc_id) <= set(a.doc_id)


def test_calibrated_quality_filter_budget(spark, sf_dir):
    from pyspark.sql import functions as F

    from dask_mwu_spark.operators.curation import calibrated_quality_filter
    from dask_mwu_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = calibrated_quality_filter(docs, keep_fraction=0.5).collect()
    n_total = sum(r["n_total"] for r in out)
    n_kept = sum(r["n_kept"] for r in out)
    # the global retention honors the budget (ties at the threshold kept,
    # so >= but within one tie run of the target)
    assert n_total == docs.count()
    assert 0.5 <= n_kept / n_total <= 0.6
    thresholds = {r["threshold"] for r in out}
    assert len(thresholds) == 1  # one GLOBAL threshold, repeated per stratum

    # approx path: same shape, threshold within sketch error of exact
    approx = calibrated_quality_filter(
        docs, keep_fraction=0.5, exact=False
    ).collect()
    t_exact = thresholds.pop()
    t_approx = {r["threshold"] for r in approx}.pop()
    assert abs(t_approx - t_exact) < 0.05


def test_curation_funnel_consistent_with_curate(spark, sf_dir):
    from dask_mwu_spark.operators.curation import curate, curation_funnel
    from dask_mwu_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    funnel = {r["stage"]: r.asDict() for r in curation_funnel(docs).collect()}
    assert list(funnel) == [
        "1_exact_dedup", "2_quality", "3_repetition", "4_lang_match",
    ]
    # stages chain: n_out of stage k == n_in of stage k+1; monotone
    stages = list(funnel.values())
    for a, b in zip(stages, stages[1:]):
        assert a["n_out"] == b["n_in"]
        assert a["n_out"] <= a["n_in"]
    assert stages[0]["n_in"] == docs.count()
    # the funnel's terminal count equals the composed curate() survivors
    assert stages[-1]["n_out"] == curate(docs).count()
