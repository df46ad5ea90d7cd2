"""Round-5 operator semantics: the Gopher/MassiveText rule battery, DSIR
importance weights, and the Matryoshka prefix-dim recall harness —
hand-built inputs with independently computed expectations."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.operators.curation import N_DSIR_BUCKETS, dsir_weights
from dask_mwu_spark.operators.similarity import matryoshka_recall
from dask_mwu_spark.operators.text import gopher_rules

rng = np.random.default_rng(11)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )


def _emb(spark, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype=np.float32).tolist() for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------------------
# gopher_rules
# ---------------------------------------------------------------------------


def test_gopher_passing_doc(spark):
    # 50 words, mean len (3+3+4+4+4)/5 = 3.6, all alphabetic, 5 distinct
    # stopwords from the paper list, no symbols/bullets/ellipses
    text = " ".join(["the", "and", "that", "have", "with"] * 10)
    out = gopher_rules(_docs(spark, [(1, text, "en", "s", len(text))])).toPandas()
    row = out.iloc[0]
    assert row.n_words == 50
    assert row.mean_word_len == 3.6
    assert row.n_stop_hits == 5
    assert row.alpha_word_ratio == 1.0
    for flag in (
        "r_word_count",
        "r_mean_word_len",
        "r_symbol",
        "r_bullet",
        "r_ellipsis",
        "r_alpha_words",
        "r_stopwords",
        "keep",
    ):
        assert row[flag] == 1, flag


def test_gopher_word_count_bounds(spark):
    short = " ".join(["the", "and"] * 5)  # 10 words < 50
    out = gopher_rules(_docs(spark, [(1, short, "en", "s", 1)])).toPandas()
    assert out.iloc[0].r_word_count == 0
    assert out.iloc[0].keep == 0


def test_gopher_mean_word_len_and_alpha(spark):
    # 50 single-char words: mean len 1 < 3 fails; digits fail alpha rule
    base = ["a"] * 25 + ["1"] * 25
    out = gopher_rules(
        _docs(spark, [(1, " ".join(base), "en", "s", 1)])
    ).toPandas()
    row = out.iloc[0]
    assert row.mean_word_len == 1.0
    assert row.r_mean_word_len == 0
    assert row.alpha_word_ratio == 0.5
    assert row.r_alpha_words == 0


def test_gopher_symbol_ratio(spark):
    # 10 words, 2 hashes + 1 ellipsis -> (2 + 1) / 10 = 0.3 > 0.1
    text = "the# and# word... " + " ".join(["be"] * 7)
    out = gopher_rules(_docs(spark, [(1, text, "en", "s", 1)])).toPandas()
    row = out.iloc[0]
    assert row.symbol_ratio == 0.3
    assert row.r_symbol == 0


def test_gopher_line_rules(spark):
    # 4 lines: 2 bullets (0.5 <= 0.9 passes), 2 ellipsis-terminated
    # (0.5 > 0.3 fails); unicode '…' counts as an ellipsis termination
    text = "• one two\n- three four\nplain line...\nmore text…"
    out = gopher_rules(_docs(spark, [(1, text, "en", "s", 1)])).toPandas()
    row = out.iloc[0]
    assert row.bullet_ratio == 0.5
    assert row.r_bullet == 1
    assert row.ellipsis_ratio == 0.5
    assert row.r_ellipsis == 0


def test_gopher_line_rules_keep_boundary_docs(spark):
    # the paper REMOVES strictly above the thresholds, so a doc exactly AT
    # 30% ellipsis lines (3 of 10) and 90% bullet lines (9 of 10) is kept
    ell = "\n".join(["plain words here"] * 7 + ["tail..."] * 3)
    bul = "\n".join(["- item words"] * 9 + ["plain closing line"])
    out = (
        gopher_rules(
            _docs(spark, [(1, ell, "en", "s", 1), (2, bul, "en", "s", 1)])
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "ellipsis_ratio"] == 0.3
    assert out.loc[1, "r_ellipsis"] == 1
    assert out.loc[2, "bullet_ratio"] == 0.9
    assert out.loc[2, "r_bullet"] == 1


def test_gopher_stopword_requirement(spark):
    # 50 words, healthy lengths, but only 1 distinct required stopword
    text = " ".join(["the"] + ["word"] * 49)
    out = gopher_rules(_docs(spark, [(1, text, "en", "s", 1)])).toPandas()
    row = out.iloc[0]
    assert row.n_stop_hits == 1
    assert row.r_stopwords == 0
    assert row.keep == 0


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------


def _dsir_reference(raw, target, n_buckets=N_DSIR_BUCKETS):
    """Independent pure-Python DSIR: same md5 buckets, same add-1
    smoothing, bucket-ascending summation."""

    def buckets(text):
        words = text.split(" ")
        out = {}
        for w1, w2 in zip(words, words[1:]):
            b = int(hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:15], 16) % n_buckets
            out[b] = out.get(b, 0) + 1
        return out

    tgt, rawc = {}, {}
    for _, text in target:
        for b, c in buckets(text).items():
            tgt[b] = tgt.get(b, 0) + c
    per_doc = {doc_id: buckets(text) for doc_id, text in raw}
    for bc in per_doc.values():
        for b, c in bc.items():
            rawc[b] = rawc.get(b, 0) + c
    nt, nr = sum(tgt.values()), sum(rawc.values())
    expected = {}
    for doc_id, bc in per_doc.items():
        lw = 0.0
        for b in sorted(bc):
            lr = math.log((tgt.get(b, 0) + 1) / (nt + n_buckets)) - math.log(
                (rawc.get(b, 0) + 1) / (nr + n_buckets)
            )
            lw += bc[b] * lr
        expected[doc_id] = (sum(bc.values()), round(lw, 6) if bc else None)
    return expected


def test_dsir_matches_reference_implementation(spark):
    raw = [(1, "x y x y z"), (2, "q r q r"), (3, "x y q")]
    target = [(100, "x y x y"), (101, "y z")]
    out = (
        dsir_weights(
            _docs(spark, [(i, t, "en", "s", 1) for i, t in raw]),
            _docs(spark, [(i, t, "en", "s", 1) for i, t in target]),
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    expected = _dsir_reference(raw, target)
    for doc_id, (n_bg, lw) in expected.items():
        assert out.loc[doc_id, "n_bigrams"] == n_bg
        assert abs(out.loc[doc_id, "log_weight"] - lw) < 1e-9


def test_dsir_target_like_scores_higher(spark):
    # doc 1's bigrams all appear in the target; doc 2's are absent
    raw = [(1, "x y x y"), (2, "foo bar foo bar")]
    target = [(100, "x y x y x y")]
    out = (
        dsir_weights(
            _docs(spark, [(i, t, "en", "s", 1) for i, t in raw]),
            _docs(spark, [(i, t, "en", "s", 1) for i, t in target]),
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "log_weight"] > out.loc[2, "log_weight"]


def test_dsir_zero_bigram_doc_null(spark):
    out = (
        dsir_weights(
            _docs(spark, [(1, "single", "en", "s", 1)]),
            _docs(spark, [(100, "x y", "en", "s", 1)]),
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_bigrams"] == 0
    assert pd.isna(out.loc[1, "log_weight"])


def test_dsir_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import pyspark.sql.functions as F

    raw = docs.where(F.col("doc_id") % 50 != 0)
    tgt = docs.where(F.col("doc_id") % 50 == 0)
    a = dsir_weights(raw, tgt).toPandas().set_index("doc_id").sort_index()
    b = (
        dsir_weights(raw.repartition(13), tgt.repartition(3))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# matryoshka_recall
# ---------------------------------------------------------------------------


def test_matryoshka_full_width_recall_is_one(spark):
    base = rng.normal(size=(30, 64))
    out = matryoshka_recall(
        _emb(spark, base), prefix_dims=(64,), n_queries=3, k=4
    ).toPandas()
    assert len(out) == 1
    assert out.iloc[0].prefix_dims == 64
    assert out.iloc[0].n_truth == 12  # 3 queries x 4
    assert out.iloc[0].recall == 1.0


def test_matryoshka_matches_numpy_prefix_ranking(spark):
    base = rng.normal(size=(25, 64))
    p, nq, k = 8, 2, 5
    out = (
        matryoshka_recall(_emb(spark, base), prefix_dims=(p,), n_queries=nq, k=k)
        .toPandas()
        .iloc[0]
    )
    f = base.astype(np.float32).astype(np.float64)

    def topk(mat):
        norms = np.linalg.norm(mat, axis=1)
        hits = {}
        for q in range(nq):
            cos = mat @ mat[q] / (norms * norms[q])
            order = sorted(
                (i for i in range(len(mat)) if i != q),
                key=lambda i: (-round(cos[i], 6), i),
            )
            hits[q] = set(order[:k])
        return hits

    truth, approx = topk(f), topk(f[:, :p])
    n_hit = sum(len(truth[q] & approx[q]) for q in range(nq))
    assert out.n_truth == nq * k
    assert out.n_hit == n_hit
    assert out.recall == round(n_hit / (nq * k), 6)


def test_matryoshka_default_three_rows(spark):
    base = rng.normal(size=(20, 64))
    out = matryoshka_recall(_emb(spark, base)).toPandas()
    assert sorted(out.prefix_dims) == [8, 16, 32]
    assert (out.n_truth == 50).all()  # 10 queries x 5 with 20 vectors? no:
    # 10 queries, k=5, 19 candidates each -> 5 kept: n_truth = 50


# ---------------------------------------------------------------------------
# fuzzy_contamination
# ---------------------------------------------------------------------------


def test_fuzzy_contamination_identical_doc(spark):
    from dask_mwu_spark.operators.curation import fuzzy_contamination

    text = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    train = _docs(spark, [(1, text, "en", "s", 1), (2, "a b c d e f g h", "en", "s", 1)])
    ev = _docs(spark, [(100, text, "en", "s", 1)])
    out = fuzzy_contamination(train, ev, est_threshold=0.5).toPandas()
    assert list(out.doc_id) == [1]
    assert out.iloc[0].n_eval_matches == 1
    assert out.iloc[0].max_est_jaccard == 1.0


def test_fuzzy_contamination_catches_paraphrase(spark):
    from dask_mwu_spark.operators.curation import (
        contamination,
        fuzzy_contamination,
    )

    # train doc 1 = eval doc with ONE word swapped mid-text: most 3-gram
    # shingles survive, so the minhash estimate stays high while the doc
    # is not an exact duplicate
    base = [f"w{i}" for i in range(30)]
    para = list(base)
    para[15] = "SWAPPED"
    train = _docs(spark, [(1, " ".join(para), "en", "s", 1)])
    ev = _docs(spark, [(100, " ".join(base), "en", "s", 1)])
    out = fuzzy_contamination(train, ev, est_threshold=0.5).toPandas()
    assert list(out.doc_id) == [1]
    assert 0.5 <= out.iloc[0].max_est_jaccard < 1.0
    # sanity: the exact-shingle test ALSO flags it (shared shingles), but
    # the fuzzy path is what quantifies how near-identical it is
    assert contamination(train, ev).count() == 1


def test_fuzzy_contamination_unrelated_docs_empty(spark):
    from dask_mwu_spark.operators.curation import fuzzy_contamination

    train = _docs(spark, [(1, " ".join(f"a{i}" for i in range(20)), "en", "s", 1)])
    ev = _docs(spark, [(100, " ".join(f"b{i}" for i in range(20)), "en", "s", 1)])
    assert fuzzy_contamination(train, ev, est_threshold=0.25).count() == 0


# ---------------------------------------------------------------------------
# dsir_resample
# ---------------------------------------------------------------------------


def test_dsir_resample_matches_exp_domain_reference(spark):
    from dask_mwu_spark.operators.curation import dsir_resample

    raw = [(i, f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 4}") for i in range(1, 30)]
    target = [(100, "w0 w1 w2 w0 w1")]
    out = dsir_resample(
        _docs(spark, [(i, t, "en", "s", 1) for i, t in raw]),
        _docs(spark, [(i, t, "en", "s", 1) for i, t in target]),
        k=5,
    ).toPandas()
    # independent exp-domain reference: key_es = ln(u)/exp(lw), select k
    # LARGEST == the operator's k smallest ln(-ln u) - lw
    expected = _dsir_reference(raw, target)
    keys = {}
    for doc_id, (_, lw) in expected.items():
        if lw is None:
            continue
        u = (
            int(hashlib.md5(f"dsir:{doc_id}".encode()).hexdigest()[:15], 16) + 1.0
        ) / float(1 << 60)
        keys[doc_id] = math.log(u) / math.exp(lw)
    ref_ids = [
        d for d, _ in sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    ]
    assert list(out.doc_id) == ref_ids
    assert list(out["rank"]) == [1, 2, 3, 4, 5]


def test_dsir_resample_excludes_zero_bigram_docs(spark):
    from dask_mwu_spark.operators.curation import dsir_resample

    out = dsir_resample(
        _docs(spark, [(1, "single", "en", "s", 1), (2, "x y z", "en", "s", 1)]),
        _docs(spark, [(100, "x y", "en", "s", 1)]),
        k=10,
    ).toPandas()
    assert list(out.doc_id) == [2]


def test_fuzzy_contamination_partition_invariant(spark, sf_dir):
    import pyspark.sql.functions as F

    from dask_mwu_spark.operators.curation import fuzzy_contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.where(F.col("doc_id") % 50 != 0)
    tgt = docs.where(F.col("doc_id") % 50 == 0)
    a = (
        fuzzy_contamination(raw, tgt, est_threshold=0.25)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    b = (
        fuzzy_contamination(raw.repartition(17), tgt.repartition(2), est_threshold=0.25)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    pd.testing.assert_frame_equal(a, b)


def test_gopher_rules_streaming_twin(spark, tmp_path):
    """gopher_rules is stateless row work, so it runs unchanged on a
    streaming DataFrame — the curation filter belongs in the ingest path,
    not only in batch sweeps.  stream(AvailableNow) == batch."""
    import pyspark.sql.functions as F

    from dask_mwu_spark.operators.text import gopher_rules

    rows = [
        (1, " ".join(["the", "and", "that", "have", "with"] * 10), "en", "s", 1),
        (2, "too short", "en", "s", 1),
    ]
    src = str(tmp_path / "src")
    batch_df = _docs(spark, rows)
    batch_df.write.parquet(src)
    batch = gopher_rules(spark.read.parquet(src)).toPandas().sort_values("doc_id")
    stream = (
        spark.readStream.schema(batch_df.schema).parquet(src)
    )
    q = (
        gopher_rules(stream)
        .writeStream.format("memory")
        .queryName("gopher_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM gopher_stream").toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        batch.reset_index(drop=True), got.reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# product quantization (pq_encode / pq_topk)
# ---------------------------------------------------------------------------


def test_pq_encode_matches_numpy_argmin(spark):
    from dask_mwu_spark.operators.similarity import (
        N_PQ_CENTROIDS,
        N_PQ_SUB,
        PQ_SUB_DIM,
        pq_codebook,
        pq_encode,
    )

    base = rng.normal(size=(12, 64))
    out = pq_encode(_emb(spark, base)).toPandas()
    assert len(out) == 12 * N_PQ_SUB
    assert out.code.between(0, N_PQ_CENTROIDS - 1).all()
    f = base.astype(np.float32).astype(np.float64)
    for row in out.itertuples():
        sub = f[row.vec_id, row.s * PQ_SUB_DIM : (row.s + 1) * PQ_SUB_DIM]
        dists = [
            round(sum((sub[d] - w) ** 2 for d, w in enumerate(pq_codebook(row.s, c))), 6)
            for c in range(N_PQ_CENTROIDS)
        ]
        assert row.code == dists.index(min(dists))


def test_pq_identical_vectors_identical_codes(spark):
    from dask_mwu_spark.operators.similarity import pq_encode

    base = rng.normal(size=(6, 64))
    base[4] = base[1]
    out = pq_encode(_emb(spark, base)).toPandas()
    c1 = out[out.vec_id == 1].sort_values("s").code.tolist()
    c4 = out[out.vec_id == 4].sort_values("s").code.tolist()
    assert c1 == c4


def test_pq_topk_score_is_adc_sum(spark):
    from dask_mwu_spark.operators.similarity import (
        N_PQ_SUB,
        PQ_SUB_DIM,
        pq_codebook,
        pq_encode,
        pq_topk,
    )

    base = rng.normal(size=(15, 64))
    emb = _emb(spark, base)
    codes = pq_encode(emb).toPandas().set_index(["vec_id", "s"]).code
    out = pq_topk(emb, n_queries=2, k=4).toPandas()
    f = base.astype(np.float32).astype(np.float64)
    for row in out.itertuples():
        expected = 0.0
        for s in range(N_PQ_SUB):
            q_sub = f[row.q_id, s * PQ_SUB_DIM : (s + 1) * PQ_SUB_DIM]
            cb = pq_codebook(s, codes.loc[(row.vec_id, s)])
            expected += sum(q * w for q, w in zip(q_sub, cb))
        assert abs(row.score - round(expected, 6)) < 1e-9
    assert (out.groupby("q_id").size() == 4).all()


def test_pq_recall_high_when_vectors_are_quantizable(spark):
    """With vectors built AS concatenations of codebook centroids (+ tiny
    noise), quantization error is ~0 and the ADC ranking must recover the
    exact top-k — proving the machinery is sound and that low recall on
    random data measures codebook fit, not a harness defect."""
    from dask_mwu_spark.operators.similarity import (
        N_PQ_SUB,
        ann_recall_eval,
        pq_codebook,
        pq_topk,
    )

    local = np.random.default_rng(5)
    vecs = []
    for _ in range(40):
        parts = [
            np.array(pq_codebook(s, int(local.integers(16)))) for s in range(N_PQ_SUB)
        ]
        vecs.append(np.concatenate(parts) + local.normal(scale=1e-4, size=64))
    emb = _emb(spark, np.array(vecs))
    out = ann_recall_eval(
        emb, n_queries=5, k=3, approx=pq_topk(emb, n_queries=5, k=3).select("q_id", "vec_id")
    ).toPandas()
    assert out.recall.mean() >= 0.8


def test_ivf_pq_scores_subset_of_pq_cells(spark):
    """IVF-PQ candidates are exactly the probed-cell members, and every
    reported score equals the full PQ ADC score of that pair (the cell
    restriction changes WHICH pairs are scored, never the score)."""
    from dask_mwu_spark.operators.similarity import ivf_pq_topk, pq_topk

    base = rng.normal(size=(30, 64))
    emb = _emb(spark, base)
    ivf = ivf_pq_topk(emb, n_queries=3, k=4, n_probe=16).toPandas()
    # n_probe = n_centroids probes EVERY cell -> identical to plain PQ ADC
    full = pq_topk(emb, n_queries=3, k=4).toPandas()
    a = ivf.sort_values(["q_id", "vec_id"]).reset_index(drop=True)
    b = full.sort_values(["q_id", "vec_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_pq_restricts_candidates(spark):
    from dask_mwu_spark.operators.similarity import ivf_index, ivf_pq_topk

    base = rng.normal(size=(40, 64))
    emb = _emb(spark, base)
    out = ivf_pq_topk(emb, n_queries=2, k=10, n_probe=1).toPandas()
    cells = ivf_index(emb).toPandas().set_index("vec_id").cent_id
    for row in out.itertuples():
        # with n_probe=1 every hit must share the query's own... not
        # necessarily the query's cell — the PROBED cell is the nearest
        # centroid to the query, which is the query's own assignment
        assert cells.loc[row.vec_id] == cells.loc[row.q_id]


# ---------------------------------------------------------------------------
# hard_negatives / knn_label_consistency (label-aware embedding ops)
# ---------------------------------------------------------------------------


def _emb_labelled(spark, vecs, labels):
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype=np.float32).tolist() for v in vecs],
            "label": list(labels),
        }
    )
    return spark.createDataFrame(pdf)


def test_hard_negatives_excludes_query_label(spark):
    from dask_mwu_spark.operators.similarity import hard_negatives

    base = rng.normal(size=(30, 16))
    labels = [i % 3 for i in range(30)]
    out = hard_negatives(
        _emb_labelled(spark, base, labels), n_queries=5, k=4
    ).toPandas()
    assert set(out.q_id) == set(range(5))
    assert (out.groupby("q_id").size() == 4).all()
    # the whole point: every mined negative is cross-label
    assert (out.neg_label != out.q_label).all()


def test_hard_negatives_picks_nearest_cross_label(spark):
    from dask_mwu_spark.operators.similarity import hard_negatives

    # query 0 (label 0) at e0; vec 1 = same label, nearly identical
    # (must be skipped); vec 2 = cross-label, close; vec 3 = cross-label,
    # orthogonal.  k=1 must return vec 2.
    vecs = [
        [1.0, 0.0, 0.0],
        [0.99, 0.1, 0.0],
        [0.9, 0.3, 0.0],
        [0.0, 1.0, 0.0],
    ]
    out = hard_negatives(
        _emb_labelled(spark, vecs, [0, 0, 1, 1]), n_queries=1, k=1
    ).toPandas()
    assert len(out) == 1
    assert out.iloc[0].vec_id == 2
    assert out.iloc[0].neg_label == 1


def test_knn_consistency_separated_clusters(spark):
    from dask_mwu_spark.operators.similarity import knn_label_consistency

    # two tight, well-separated clusters -> every neighbourhood is pure
    a = rng.normal(size=(10, 8)) * 0.01 + np.array([10.0] + [0.0] * 7)
    b = rng.normal(size=(10, 8)) * 0.01 + np.array([0.0] * 7 + [10.0])
    vecs = np.vstack([a, b])
    labels = [0] * 10 + [1] * 10
    out = knn_label_consistency(
        _emb_labelled(spark, vecs, labels), n_queries=20, k=5
    ).toPandas()
    assert len(out) == 2
    assert (out.mean_consistency == 1.0).all()
    assert (out.min_consistency == 1.0).all()


def test_knn_consistency_shuffled_labels_low(spark):
    from dask_mwu_spark.operators.similarity import knn_label_consistency

    # one isotropic blob with random labels -> consistency ~ label share,
    # far below the separated-cluster 1.0
    vecs = rng.normal(size=(40, 8))
    labels = [int(x) for x in rng.integers(0, 4, size=40)]
    out = knn_label_consistency(
        _emb_labelled(spark, vecs, labels), n_queries=40, k=8
    ).toPandas()
    assert (out.mean_consistency < 0.9).all()


# ---------------------------------------------------------------------------
# temperature_mixture
# ---------------------------------------------------------------------------


def _sourced_docs(spark):
    rows = []
    did = 0
    for src, n_docs, words in (("big", 8, 40), ("mid", 4, 20), ("tiny", 2, 5)):
        for _ in range(n_docs):
            text = " ".join(f"w{i}" for i in range(words))
            rows.append((did, text, "en", src, len(text)))
            did += 1
    return _docs(spark, rows)


def test_temperature_alpha_one_is_natural_sampling(spark):
    from dask_mwu_spark.operators.curation import temperature_mixture

    out = (
        temperature_mixture(_sourced_docs(spark), alpha=1.0, budget_tokens=10_000)
        .toPandas()
        .set_index("source")
    )
    # alpha=1: weight == p_raw (both rounded to 6)
    for src in ("big", "mid", "tiny"):
        assert abs(out.loc[src].weight - out.loc[src].p_raw) <= 2e-6


def test_temperature_low_alpha_flattens_toward_uniform(spark):
    from dask_mwu_spark.operators.curation import temperature_mixture

    docs = _sourced_docs(spark)
    nat = temperature_mixture(docs, alpha=1.0).toPandas().set_index("source")
    cool = temperature_mixture(docs, alpha=0.3).toPandas().set_index("source")
    # flattening: the dominant source loses mass, the rare source gains
    assert cool.loc["big"].weight < nat.loc["big"].weight
    assert cool.loc["tiny"].weight > nat.loc["tiny"].weight
    # alpha -> 0 limit: pow(p, 0) = 1 -> exactly uniform
    unif = temperature_mixture(docs, alpha=0.0).toPandas()
    assert (abs(unif.weight - 1.0 / 3.0) < 2e-6).all()


def test_temperature_budget_and_epochs(spark):
    from dask_mwu_spark.operators.curation import temperature_mixture

    out = temperature_mixture(
        _sourced_docs(spark), alpha=0.5, budget_tokens=1_000
    ).toPandas()
    # allocations track the budget (floor+0.5 rounding, so within n_sources/2)
    assert abs(out.alloc_tokens.sum() - 1_000) <= 2
    # epochs = alloc / corpus tokens on every row
    for row in out.itertuples():
        assert abs(row.epochs - round(row.alloc_tokens / row.n_tokens, 6)) <= 1e-9


# ---------------------------------------------------------------------------
# cross_source_matrix
# ---------------------------------------------------------------------------


def test_cross_source_matrix_cells(spark):
    from dask_mwu_spark.operators.dedup import cross_source_matrix

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight"
    rows = [
        # within-source pair (diagonal cell s1/s1)
        (0, dup, "en", "s1", len(dup)),
        (1, dup, "en", "s1", len(dup)),
        # cross-source pair (off-diagonal s1/s2, via doc 0 and doc 1 too)
        (2, dup, "en", "s2", len(dup)),
        # unrelated doc -> no pair
        (3, other, "en", "s3", len(other)),
    ]
    out = cross_source_matrix(_docs(spark, rows)).toPandas()
    cells = {(r.source_a, r.source_b): r for r in out.itertuples()}
    # identical docs: jaccard 1.0; three dup docs -> 3 pairs:
    # (0,1) diag s1/s1, (0,2) + (1,2) off-diag s1/s2
    assert cells[("s1", "s1")].n_pairs == 1
    assert cells[("s1", "s2")].n_pairs == 2
    assert cells[("s1", "s1")].mean_jaccard == 1.0
    assert cells[("s1", "s2")].mean_jaccard == 1.0
    assert ("s3", "s3") not in cells
    # unordered key: no cell with source_a > source_b
    assert (out.source_a <= out.source_b).all()


# ---------------------------------------------------------------------------
# label_centroids / label_centroid_outliers
# ---------------------------------------------------------------------------


def test_label_centroids_match_numpy_mean(spark):
    from dask_mwu_spark.operators.similarity import label_centroids

    base = rng.normal(size=(24, 8))
    labels = [i % 2 for i in range(24)]
    out = (
        label_centroids(_emb_labelled(spark, base, labels))
        .toPandas()
        .set_index("label")
    )
    f32 = base.astype(np.float32).astype(np.float64)
    for lab in (0, 1):
        want = np.round(f32[np.array(labels) == lab].mean(axis=0), 6)
        got = np.asarray(out.loc[lab].cvec)
        assert np.allclose(got, want, atol=2e-6)
        assert out.loc[lab].n_members == 12


def test_label_outliers_flag_planted_mislabel(spark):
    from dask_mwu_spark.operators.similarity import label_centroid_outliers

    # cluster of label-0 vectors near +e0; one "label 0" vector pointing
    # the OPPOSITE way is the planted mislabel -> must rank 1 (most
    # centroid-distant by cosine)
    vecs = [[1.0, 0.05 * i, 0.0] for i in range(9)] + [[-1.0, 0.0, 0.0]]
    labels = [0] * 10
    out = label_centroid_outliers(
        _emb_labelled(spark, vecs, labels), k=3
    ).toPandas()
    top = out[out["rank"] == 1].iloc[0]
    assert top.vec_id == 9
    assert top.cosine < 0
    assert (out.n_members == 10).all()


# ---------------------------------------------------------------------------
# lsh_stratified_sample
# ---------------------------------------------------------------------------


def test_lsh_sample_covers_corpus_and_reps_are_min(spark):
    from dask_mwu_spark.operators.similarity import (
        lsh_buckets,
        lsh_stratified_sample,
    )

    base = rng.normal(size=(60, 64))
    emb = _emb(spark, base)
    out = lsh_stratified_sample(emb).toPandas()
    # cells partition the corpus: populations sum to n, fracs to ~1
    assert out.n_members.sum() == 60
    assert abs(out.frac.sum() - 1.0) < 1e-4
    # rep = min vec_id of its cell, and every rep is in its own cell
    cells = lsh_buckets(emb).toPandas().groupby("bucket").vec_id.min()
    for row in out.itertuples():
        assert row.rep_vec_id == cells.loc[row.bucket]


def test_lsh_sample_tables_decorrelate(spark):
    from dask_mwu_spark.operators.similarity import lsh_stratified_sample

    base = rng.normal(size=(60, 64))
    emb = _emb(spark, base)
    a = lsh_stratified_sample(emb, table=0).toPandas()
    b = lsh_stratified_sample(emb, table=1).toPandas()
    # an independent hyperplane set re-partitions the sphere: the cell
    # population multiset should differ (probability ~0 it coincides)
    assert sorted(a.n_members) != sorted(b.n_members) or set(
        a.rep_vec_id
    ) != set(b.rep_vec_id)


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_matches_hand_computation(spark):
    from dask_mwu_spark.operators.text import pmi_collocations

    # "aa bb" always adjacent (8x), "cc" background noise
    rows = []
    for i in range(8):
        rows.append((i, "aa bb cc cc cc", "en", "s", 14))
    out = pmi_collocations(_docs(spark, rows), k=5, min_count=2).toPandas()
    nt = 8 * 5  # total tokens
    nb = 8 * 4  # total bigrams
    got = out[(out.w1 == "aa") & (out.w2 == "bb")].iloc[0]
    assert got.c2 == 8
    want = math.log((8 / nb) / ((8 / nt) * (8 / nt)))
    assert abs(got.pmi - round(want, 6)) < 2e-6
    # the always-adjacent pair beats the repeated background pair
    cc = out[(out.w1 == "cc") & (out.w2 == "cc")].iloc[0]
    assert got.pmi > cc.pmi


def test_pmi_min_count_suppresses_rare_pairs(spark):
    from dask_mwu_spark.operators.text import pmi_collocations

    rows = [(0, "xx yy", "en", "s", 5)] + [
        (i, "aa bb aa bb", "en", "s", 11) for i in range(1, 4)
    ]
    out = pmi_collocations(_docs(spark, rows), k=10, min_count=3).toPandas()
    assert not ((out.w1 == "xx") & (out.w2 == "yy")).any()
    assert (out.c2 >= 3).all()


# ---------------------------------------------------------------------------
# ab_test / price_trend
# ---------------------------------------------------------------------------


def test_ab_test_matches_hand_computation(spark):
    from dask_mwu_spark.functions.hashing import md5_long  # noqa: F401
    from dask_mwu_spark.operators.events import ab_test

    users = list(range(40))
    # every user emits "base"; users with even id also emit "conv"
    rows = [(u, "base") for u in users] + [(u, "conv") for u in users if u % 2 == 0]
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "event_type"]))
    out = ab_test(ev).toPandas().set_index("event_type")
    na, nb = int(out.iloc[0].n_a), int(out.iloc[0].n_b)
    assert na + nb == 40
    # "base" converts EVERY user in both arms -> se = 0 -> NULL z/p
    base = out.loc["base"]
    assert base.x_a == na and base.x_b == nb
    assert pd.isna(base.z) and pd.isna(base.p_value)
    # "conv": hand-compute the pooled z from the returned counts
    conv = out.loc["conv"]
    xa, xb = int(conv.x_a), int(conv.x_b)
    pa, pb = xa / na, xb / nb
    pp = (xa + xb) / (na + nb)
    se = math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    want_z = (pa - pb) / se
    assert abs(conv.z - round(want_z, 6)) <= 2e-6
    want_p = min(1.0, math.erfc(abs(want_z) / math.sqrt(2)))
    assert abs(conv.p_value - round(want_p, 6)) <= 2e-6


def test_ab_test_aa_split_is_balanced(spark):
    from dask_mwu_spark.operators.events import ab_test

    # A/A: a deterministic hash split of 2000 users should be near 50/50
    rows = [(u, "e") for u in range(2000)]
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "event_type"]))
    out = ab_test(ev).toPandas().iloc[0]
    assert abs(out.n_a - out.n_b) < 200  # ~4.5 sigma
    # everyone converted in both arms -> identical proportions
    assert out.p_a == 1.0 and out.p_b == 1.0


def test_price_trend_matches_numpy_ols(spark):
    from dask_mwu_spark.operators.audit import price_trend

    # part 1: price rises 10.00/day; part 2: flat; part 3: too few rows
    rows = []
    for i in range(10):
        rows.append((1, f"1995-01-{i+1:02d}", 100.00 + 10.0 * i))
        rows.append((2, f"1995-01-{i+1:02d}", 500.00))
    rows.append((3, "1995-01-01", 1.00))
    pdf = pd.DataFrame(rows, columns=["l_partkey", "d", "l_extendedprice"])
    pdf["l_shipdate"] = pd.to_datetime(pdf.pop("d"))
    li = spark.createDataFrame(pdf)
    out = price_trend(li, k=10, min_rows=5).toPandas().set_index("l_partkey")
    assert 3 not in out.index  # min_rows filter
    assert abs(out.loc[1].slope_per_day - 10.0) < 1e-6
    assert out.loc[2].slope_per_day == 0.0
    # cross-check part 1 against numpy lstsq on the same points
    x = np.arange(10)
    y = 100.0 + 10.0 * x
    want = np.polyfit(x, y, 1)[0]
    assert abs(out.loc[1].slope_per_day - round(want, 6)) < 1e-6


# ---------------------------------------------------------------------------
# bloom_decontaminate
# ---------------------------------------------------------------------------


def test_bloom_decontaminate_equals_exact_path(spark, sf_dir):
    from dask_mwu_spark.operators.curation import bloom_decontaminate, decontaminate
    from dask_mwu_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 50 != 0)
    ev = docs.where(F.col("doc_id") % 50 == 0)
    a = sorted(r.doc_id for r in bloom_decontaminate(train, ev).select("doc_id").collect())
    b = sorted(r.doc_id for r in decontaminate(train, ev).select("doc_id").collect())
    assert a == b


def test_bloom_decontaminate_drops_planted_contamination(spark):
    from dask_mwu_spark.operators.curation import bloom_decontaminate

    leak = "alpha beta gamma delta epsilon zeta"
    clean = "one two three four five six seven"
    train = _docs(
        spark,
        [(1, leak, "en", "s", len(leak)), (2, clean, "en", "s", len(clean))],
    )
    ev = _docs(spark, [(100, leak, "en", "s", len(leak))])
    kept = bloom_decontaminate(train, ev).toPandas()
    assert list(kept.doc_id) == [2]


# ---------------------------------------------------------------------------
# textrank_keywords / basket_lift
# ---------------------------------------------------------------------------


def test_textrank_hub_word_outranks_chain_words(spark):
    from dask_mwu_spark.operators.text import textrank_keywords

    # "hub" touches 8 distinct neighbours; the chain words touch <= 2
    text = "hub n1 hub n2 hub n3 hub n4 hub n5 hub n6 hub n7 hub n8"
    out = textrank_keywords(
        _docs(spark, [(1, text, "en", "s", len(text))]), k=20
    ).toPandas()
    assert out.iloc[0].word == "hub"
    assert (out.iloc[0]["rank"] > out[out.word != "hub"]["rank"]).all()
    # fixed-round pagerank over a connected graph: total rank mass ~ 1
    assert abs(out["rank"].sum() - 1.0) < 0.01


def test_basket_lift_hand_computed(spark):
    from dask_mwu_spark.operators.affinity import basket_lift

    # 6 orders: A+B together in 4, C alone in 2 -> lift(A,B) = (4*6)/(4*4)
    li, pt = [], [(1, "A"), (2, "B"), (3, "C")]
    for o in range(4):
        li += [(o, 1), (o, 2)]
    for o in (4, 5):
        li += [(o, 3)]
    li_df = spark.createDataFrame(
        pd.DataFrame(li, columns=["l_orderkey", "l_partkey"])
    )
    pt_df = spark.createDataFrame(
        pd.DataFrame(pt, columns=["p_partkey", "p_brand"])
    )
    out = basket_lift(li_df, pt_df, min_pair_orders=1).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.brand_a, row.brand_b, row.n_both) == ("A", "B", 4)
    assert abs(row.lift - round(4 * 6 / (4 * 4), 6)) < 1e-9
    assert abs(row.support - round(4 / 6, 6)) < 1e-9


def test_basket_lift_line_level_dups_do_not_inflate(spark):
    from dask_mwu_spark.operators.affinity import basket_lift

    # the same brand appearing on 3 lines of one order counts ONCE
    li = [(0, 1), (0, 1), (0, 1), (0, 2)]
    pt = [(1, "A"), (2, "B")]
    li_df = spark.createDataFrame(
        pd.DataFrame(li, columns=["l_orderkey", "l_partkey"])
    )
    pt_df = spark.createDataFrame(
        pd.DataFrame(pt, columns=["p_partkey", "p_brand"])
    )
    out = basket_lift(li_df, pt_df, min_pair_orders=1).toPandas()
    assert out.iloc[0].n_both == 1


# ---------------------------------------------------------------------------
# dominant_pc
# ---------------------------------------------------------------------------


def test_dominant_pc_recovers_planted_direction(spark):
    from dask_mwu_spark.operators.similarity import dominant_pc

    # isotropic noise + a strong planted direction along e0+e1
    planted = np.zeros(64)
    planted[0] = planted[1] = 1 / math.sqrt(2)
    coefs = rng.normal(size=(80, 1)) * 8.0
    base = rng.normal(size=(80, 64)) * 0.3 + coefs * planted
    out = dominant_pc(_emb(spark, base)).toPandas().sort_values("dim")
    v = out.loading.to_numpy()
    # unit norm (loadings are round-6 of w/||w||)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    # aligned with the planted direction (sign-free)
    assert abs(float(v @ planted)) > 0.95
    # eigval constant across rows and positive
    assert out.eigval.nunique() == 1 and out.eigval.iloc[0] > 0


def test_dominant_pc_matches_numpy_power_iteration(spark):
    from dask_mwu_spark.operators.similarity import dominant_pc

    base = rng.normal(size=(30, 64))
    out = dominant_pc(_emb(spark, base), n_iter=3).toPandas().sort_values("dim")
    # replicate: float32-cast input, round-6 mean, 3 rounds with round-6
    # w and v (engine fold order differences are below the rounding)
    x = base.astype(np.float32).astype(np.float64)
    cx = x - np.round(x.mean(axis=0), 6)
    v = np.full(64, 0.125)
    for _ in range(3):
        w = np.round(cx.T @ (cx @ v), 6)
        nrm = np.linalg.norm(w)
        v = np.round(w / nrm, 6)
    assert np.allclose(out.loading.to_numpy(), v, atol=5e-6)
    assert abs(out.eigval.iloc[0] - round(nrm, 6)) < 5e-6


# ---------------------------------------------------------------------------
# first_touch_attribution / inter_event_gaps
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id"])
    )


def test_first_touch_attribution_hand_built(spark):
    from dask_mwu_spark.operators.events import first_touch_attribution

    rows = [
        # user 1: first touch "view", converts
        (1, "view", 10, 100), (1, "purchase", 20, 101),
        # user 2: first touch "view", does not convert
        (2, "view", 10, 200), (2, "click", 30, 201),
        # user 3: first touch "click" (ts tie broken by event_id), converts
        (3, "click", 10, 300), (3, "view", 10, 301), (3, "purchase", 50, 302),
    ]
    out = (
        first_touch_attribution(_ev(spark, rows))
        .toPandas()
        .set_index("first_touch")
    )
    assert out.loc["view"].n_users == 2
    assert out.loc["view"].n_converted == 1
    assert out.loc["view"].conv_rate == 0.5
    assert out.loc["click"].n_users == 1
    assert out.loc["click"].conv_rate == 1.0
    assert "purchase" not in out.index or out.loc["purchase"].n_users == 0


def test_inter_event_gaps_hand_built(spark):
    from dask_mwu_spark.operators.events import inter_event_gaps

    s = 1_000_000_000  # 1 second in nanos
    rows = [
        # user 1 "click": gaps of 2s and 4s; user 2 "click": gap 10s
        (1, "click", 0 * s, 1), (1, "click", 2 * s, 2), (1, "click", 6 * s, 3),
        (2, "click", 0 * s, 4), (2, "click", 10 * s, 5),
        # single event -> no gap
        (3, "view", 0 * s, 6),
    ]
    out = inter_event_gaps(_ev(spark, rows)).toPandas().set_index("event_type")
    assert "view" not in out.index
    c = out.loc["click"]
    assert c.n_gaps == 3
    assert abs(c.mean_gap_s - round((2 + 4 + 10) / 3, 6)) < 1e-9
    assert c.min_gap_s == 2.0 and c.max_gap_s == 10.0


# ---------------------------------------------------------------------------
# anisotropy / canonical_by_quality / time_to_convert
# ---------------------------------------------------------------------------


def test_anisotropy_dominant_direction_scores_high(spark):
    from dask_mwu_spark.operators.similarity import anisotropy

    planted = np.zeros(64)
    planted[0] = 1.0
    strong = rng.normal(size=(60, 1)) * 10.0 * planted + rng.normal(
        size=(60, 64)
    ) * 0.2
    iso = rng.normal(size=(60, 64))
    a_strong = anisotropy(_emb(spark, strong)).toPandas().iloc[0]
    a_iso = anisotropy(_emb(spark, iso)).toPandas().iloc[0]
    assert a_strong.anisotropy > 0.9
    assert a_iso.anisotropy < 0.2
    # trace bounds the top eigenvalue
    assert 0 < a_strong.eigval <= a_strong.trace * 1.000001


def test_canonical_by_quality_keeps_best_member(spark):
    from dask_mwu_spark.operators.dedup import canonical_by_quality
    from dask_mwu_spark.operators.text import quality_scores

    # three near-identical docs; doc 3 carries extra stopword-rich text
    # so its composite quality is highest; doc 9 unrelated
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    richer = base + " the and that have with"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),
        (3, richer, "en", "s", len(richer)),
        (9, "one two three four five six seven eight nine ten", "en", "s", 49),
    ]
    docs = _docs(spark, rows)
    out = canonical_by_quality(docs, est_threshold=0.25).toPandas()
    assert len(out) == 1  # docs 1-3 cluster; doc 9 has no pair
    row = out.iloc[0]
    assert row.n_members == 3
    assert row.kept_doc == 3
    q = quality_scores(docs).toPandas().set_index("doc_id")
    assert row.quality == q.loc[3].quality
    assert q.loc[3].quality > q.loc[1].quality


def test_time_to_convert_hand_built(spark):
    from dask_mwu_spark.operators.events import time_to_convert

    s = 1_000_000_000
    rows = [
        # user 1: signup at 0, purchase at 10s -> 10s latency
        (1, "signup", 0, 1), (1, "purchase", 10 * s, 2),
        # user 2: signup, never purchases
        (2, "signup", 0, 3),
        # user 3: purchase BEFORE signup -> not a conversion
        (3, "purchase", 0, 4), (3, "signup", 5 * s, 5),
        # user 4: purchase only (never started) -> excluded entirely
        (4, "purchase", 0, 6),
    ]
    out = time_to_convert(_ev(spark, rows)).toPandas().iloc[0]
    assert out.n_started == 3
    assert out.n_converted == 1
    assert abs(out.conv_rate - round(1 / 3, 6)) < 1e-9
    assert out.mean_s == 10.0 and out.min_s == 10.0 and out.max_s == 10.0


# ---------------------------------------------------------------------------
# return_rates_wilson / revenue_concentration
# ---------------------------------------------------------------------------


def test_wilson_lower_bound_properties(spark):
    from dask_mwu_spark.operators.audit import return_rates_wilson

    # brand A: 3/4 returned (tiny sample); brand B: 400/1000 returned
    li, pt = [], [(1, "A"), (2, "B")]
    for i in range(4):
        li.append((i, 1, "R" if i < 3 else "N"))
    for i in range(1000):
        li.append((1000 + i, 2, "R" if i < 400 else "N"))
    li_df = spark.createDataFrame(
        pd.DataFrame(li, columns=["l_orderkey", "l_partkey", "l_returnflag"])
    )
    pt_df = spark.createDataFrame(
        pd.DataFrame(pt, columns=["p_partkey", "p_brand"])
    )
    out = return_rates_wilson(li_df, pt_df).toPandas().set_index("p_brand")
    # hand-check brand B against the closed form
    p, n, z = 0.4, 1000.0, 1.96
    want = (
        p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    ) / (1 + z * z / n)
    assert abs(out.loc["B"].wilson_low - round(want, 6)) < 1e-9
    # the shrinkage property: raw rate A > B, but the bound flips them
    assert out.loc["A"].rate > out.loc["B"].rate
    assert out.loc["A"].wilson_low < out.loc["B"].wilson_low
    # bound is conservative: always below the raw rate
    assert (out.wilson_low < out.rate).all()


def test_revenue_hhi_hand_built(spark):
    from dask_mwu_spark.operators.audit import revenue_concentration

    orders = spark.createDataFrame(
        pd.DataFrame(
            [(1, 1, 300.0), (2, 1, 100.0), (3, 2, 100.0)],
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
    ).select("o_custkey", "o_totalprice")
    cust = spark.createDataFrame(
        pd.DataFrame([(1, 10), (2, 20)], columns=["c_custkey", "c_nationkey"])
    )
    nat = spark.createDataFrame(
        pd.DataFrame([(10, "FR"), (20, "DE")], columns=["n_nationkey", "n_name"])
    )
    out = revenue_concentration(orders, cust, nat).toPandas().set_index("n_name")
    assert out.loc["FR"].share == 0.8 and out.loc["DE"].share == 0.2
    assert abs(out.hhi.iloc[0] - round(0.8**2 + 0.2**2, 6)) < 1e-9


# ---------------------------------------------------------------------------
# dedup_aware_mixture / session_stats / degree_powerlaw
# ---------------------------------------------------------------------------


def test_dedup_mixture_discounts_duplicated_source(spark):
    from dask_mwu_spark.operators.curation import (
        dedup_aware_mixture,
        temperature_mixture,
    )

    # two sources with IDENTICAL raw token mass; src_dup is 50% duplicates
    rows, did = [], 0
    for _ in range(4):
        rows.append((did, "uniq" + str(did) + " b c d e", "en", "src_clean", 1))
        did += 1
    for i in range(4):
        rows.append((did, f"dup{i % 2} b c d e", "en", "src_dup", 1))
        did += 1
    docs = _docs(spark, rows)
    raw = temperature_mixture(docs).toPandas().set_index("source")
    adj = dedup_aware_mixture(docs).toPandas().set_index("source")
    # raw mass equal -> equal raw weights; dedup-aware shifts to clean
    assert abs(raw.loc["src_clean"].weight - raw.loc["src_dup"].weight) < 1e-6
    assert adj.loc["src_dup"].dup_frac == 0.5
    assert adj.loc["src_clean"].dup_frac == 0.0
    assert adj.loc["src_clean"].weight > adj.loc["src_dup"].weight
    assert adj.loc["src_dup"].eff_tokens == adj.loc["src_dup"].n_tokens * 0.5


def test_session_stats_hand_built(spark):
    from dask_mwu_spark.operators.events import session_stats

    m = 60 * 1_000_000_000  # one minute in nanos
    rows = [
        # user 1: two sessions — events at 0,10min then a 60min gap
        (1, "a", 0 * m, 1), (1, "a", 10 * m, 2), (1, "a", 70 * m, 3),
        # user 2: one single-event session
        (2, "a", 0 * m, 4),
    ]
    out = session_stats(_ev(spark, rows), gap_s=1800).toPandas().iloc[0]
    assert out.n_sessions == 3
    assert out.n_users == 2
    assert abs(out.mean_events - round(4 / 3, 6)) < 1e-9
    # durations: 10min, 0, 0
    assert abs(out.mean_duration_s - round(600 / 3, 6)) < 1e-9
    assert out.max_duration_s == 600.0


def test_degree_powerlaw_star_graph(spark):
    from dask_mwu_spark.operators.graph import degree_powerlaw

    # star: hub 0 connected to 1..10 -> hub degree 10, leaves degree 1
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(0, i) for i in range(1, 11)], columns=["doc_a", "doc_b"]
        )
    )
    out = degree_powerlaw(pairs).toPandas().iloc[0]
    assert out.n_nodes == 11
    assert out.max_degree == 10
    assert out.n_tail == 1  # only the hub has degree >= 2
    want = 1 + 1 / math.log(10 / 1.5)
    assert abs(out.alpha - round(want, 6)) < 2e-6


# ---------------------------------------------------------------------------
# abtt_contrast
# ---------------------------------------------------------------------------


def test_abtt_contrast_removes_common_direction_inflation(spark):
    from dask_mwu_spark.operators.similarity import abtt_contrast

    # strong shared direction + small noise: top-1 cosines are inflated
    # by the common component; removing it should drop them sharply
    planted = np.zeros(64)
    planted[0] = 1.0
    coefs = np.abs(rng.normal(size=(40, 1))) * 10.0 + 5.0
    base = coefs * planted + rng.normal(size=(40, 64)) * 0.5
    out = abtt_contrast(_emb(spark, base)).toPandas().iloc[0]
    assert out.n_queries == 10
    # centered but PC-dominated: neighbours align along the planted axis
    assert out.mean_top1_before > 0.5
    assert out.delta > 0.25
    assert out.mean_top1_after < out.mean_top1_before


def test_abtt_contrast_isotropic_near_zero_delta(spark):
    from dask_mwu_spark.operators.similarity import abtt_contrast

    base = rng.normal(size=(40, 64))
    out = abtt_contrast(_emb(spark, base)).toPandas().iloc[0]
    # no common direction -> projection barely moves the neighbours
    assert abs(out.delta) < 0.15


# ---------------------------------------------------------------------------
# ivf_recall_curve / monthly_growth
# ---------------------------------------------------------------------------


def test_ivf_recall_curve_monotone_and_saturates(spark):
    from dask_mwu_spark.operators.similarity import ivf_recall_curve

    base = rng.normal(size=(60, 64))
    out = (
        ivf_recall_curve(_emb(spark, base), n_probes=(1, 2, 16))
        .toPandas()
        .set_index("n_probe")
        .sort_index()
    )
    # more probes never hurt recall; probing every cell = brute force = 1.0
    assert out.loc[1].mean_recall <= out.loc[2].mean_recall + 1e-9
    assert out.loc[2].mean_recall <= out.loc[16].mean_recall + 1e-9
    assert out.loc[16].mean_recall == 1.0
    assert (out.n_queries == 10).all()


def test_monthly_growth_hand_built(spark):
    from dask_mwu_spark.operators.audit import monthly_growth

    pdf = pd.DataFrame(
        {
            "o_orderdate": pd.to_datetime(
                ["2024-01-05", "2024-01-20", "2024-02-10", "2024-03-01"]
            ),
            "o_totalprice": [100.0, 100.0, 300.0, 150.0],
        }
    )
    out = (
        monthly_growth(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("month")
        .sort_index()
    )
    assert out.loc["2024-01"].revenue == 200.0
    assert pd.isna(out.loc["2024-01"].mom_growth)
    assert out.loc["2024-02"].mom_growth == 0.5
    assert out.loc["2024-03"].mom_growth == -0.5


# ---------------------------------------------------------------------------
# single_source_risk / power_users
# ---------------------------------------------------------------------------


def test_supply_risk_hand_built(spark):
    from dask_mwu_spark.operators.audit import single_source_risk

    # part 1 (brand A): two suppliers; part 2 (brand A): one supplier;
    # part 3 (brand B): one supplier on many lines (still single-sourced)
    li = [(1, 10), (1, 11), (2, 10), (3, 12), (3, 12), (3, 12)]
    pt = [(1, "A"), (2, "A"), (3, "B")]
    li_df = spark.createDataFrame(
        pd.DataFrame(li, columns=["l_partkey", "l_suppkey"])
    )
    pt_df = spark.createDataFrame(
        pd.DataFrame(pt, columns=["p_partkey", "p_brand"])
    )
    out = single_source_risk(li_df, pt_df).toPandas().set_index("p_brand")
    assert out.loc["A"].n_parts == 2
    assert out.loc["A"].n_single_sourced == 1
    assert out.loc["A"].risk_frac == 0.5
    assert out.loc["B"].risk_frac == 1.0


def test_power_users_shares_and_cumsum(spark):
    from dask_mwu_spark.operators.events import power_users

    rows = [(1, "e")] * 6 + [(2, "e")] * 3 + [(3, "e")] * 1
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type"])
    )
    out = power_users(ev, k=2).toPandas()
    assert list(out.user_id) == [1, 2]
    assert out.iloc[0].share == 0.6 and out.iloc[1].share == 0.3
    assert out.iloc[1].cum_share == 0.9


# ---------------------------------------------------------------------------
# group_split / split_leakage
# ---------------------------------------------------------------------------


def test_group_split_holds_out_whole_sources(spark):
    from dask_mwu_spark.operators.curation import group_split

    rows = [(i, f"src{i % 7}") for i in range(200)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source"])
    )
    out = group_split(docs).toPandas()
    # every source maps to exactly one split (the holdout property)
    per_src = out.groupby("source")["split"].nunique()
    assert (per_src == 1).all()
    # and the assignment is deterministic across invocations
    again = group_split(docs).toPandas()
    merged = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.split_a == merged.split_b).all()


def test_split_leakage_conserves_pairs_and_orders_cells(spark):
    from dask_mwu_spark.operators.curation import split_leakage

    splits = spark.createDataFrame(
        pd.DataFrame(
            [(1, "train"), (2, "test"), (3, "train"), (4, "val")],
            columns=["doc_id", "split"],
        )
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2, 0.8), (1, 3, 0.6), (2, 4, 0.5), (3, 1, 0.4)],
            columns=["doc_a", "doc_b", "jaccard"],
        )
    )
    out = split_leakage(splits, pairs).toPandas()
    # every input pair lands in exactly one cell
    assert out.n_pairs.sum() == 4
    # cells are canonically ordered (split_a <= split_b)
    assert (out.split_a <= out.split_b).all()
    cell = out.set_index(["split_a", "split_b"])
    # train<->test leakage cell: the (1,2) pair only
    assert cell.loc[("test", "train")].n_pairs == 1
    assert cell.loc[("test", "train")].mean_jaccard == 0.8
    # within-train cell: (1,3) and (3,1) both collapse there
    assert cell.loc[("train", "train")].n_pairs == 2
