"""Round-11 regression tests.

Covers the ADVICE r10 items: the injected-model Viterbi unroll depth
(medium), OOV recovery in the injected-model DP (low), and the
hybrid-retrieval missing-query-vector guard (low).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import retrieval as rtv
from dask_mwu_spark.operators import text as tx


def _segs(df):
    got = {}
    for r in df.collect():
        got.setdefault(r["word"], []).append((r["pos"], r["piece"]))
    return {w: [p for _, p in sorted(v)] for w, v in got.items()}


# ---------------------------------------------------------------------------
# ADVICE r10 (medium): injected model trained with max_piece_len above
# the call-site default must segment bit-identically to retraining
# ---------------------------------------------------------------------------


def test_unigram_injected_model_longer_pieces_than_call_default(spark):
    """A model trained with max_piece_len=6 keeps 6-char pieces usable
    when injected at the DEFAULT call-site max_piece_len=4 — the unroll
    depth derives from the model, not the call (the exact scenario
    ADVICE r10 verified produced lo|west vs lowest before the fix)."""
    docs = spark.createDataFrame(
        [(0, "lowest lowest lowest lowest low low")],
        "doc_id long, text string",
    )
    kw = dict(max_pieces=32, max_piece_len=6, n_iter=2)
    retrained = sorted(
        tuple(r) for r in tx.unigram_lm_segments(docs, **kw).collect()
    )
    model = tx.unigram_trained_model(docs, **kw)
    # sanity: the model really contains a piece longer than 4 chars —
    # otherwise this test would pass vacuously
    assert model.filter("length(piece) > 4").count() > 0
    injected = sorted(
        tuple(r)
        for r in tx.unigram_lm_segments(docs, model=model).collect()
    )
    assert injected == retrained
    segs = _segs(tx.unigram_lm_segments(docs, model=model))
    assert segs["lowest"] == ["lowest"]


def test_unigram_encode_injected_model_longer_pieces(spark):
    """The encode last-mile inherits the derived unroll depth through
    unigram_lm_segments."""
    docs = spark.createDataFrame(
        [(0, "lowest lowest lowest lowest low low")],
        "doc_id long, text string",
    )
    model = tx.unigram_trained_model(
        docs, max_pieces=32, max_piece_len=6, n_iter=2
    )
    enc = tx.unigram_encode_ids(
        docs, model=model, max_vocab=10_000
    ).collect()
    assert "lowest" in {r["piece"] for r in enc}


# ---------------------------------------------------------------------------
# ADVICE r10 (low): the DP recovers after an out-of-alphabet char
# ---------------------------------------------------------------------------


def test_unigram_oov_char_dp_recovers(spark):
    """An out-of-alphabet character scores the sentinel and falls back
    to a single char, but positions AFTER it segment with real
    inventory pieces again (before the fix the NULL poisoned every
    later 'cand >= best' and the whole suffix degraded to chars)."""
    train = spark.createDataFrame(
        [(0, "low low low low lower lowest")], "doc_id long, text string"
    )
    model = tx.unigram_trained_model(
        train, max_pieces=16, max_piece_len=4, n_iter=2
    )
    # 'low' is a trained piece; 'q' is out-of-alphabet
    new = spark.createDataFrame(
        [(0, "qlow lowqlow")], "doc_id long, text string"
    )
    segs = _segs(tx.unigram_lm_segments(new, model=model))
    assert segs["qlow"] == ["q", "low"]
    assert segs["lowqlow"] == ["low", "q", "low"]


def test_unigram_oov_output_stays_total_and_deterministic(spark):
    """Multiple OOV chars in one word: every position is still
    emitted, concatenation reconstructs the word, repeated runs agree."""
    train = spark.createDataFrame(
        [(0, "low low lower lowest")], "doc_id long, text string"
    )
    model = tx.unigram_trained_model(
        train, max_pieces=16, max_piece_len=4, n_iter=2
    )
    new = spark.createDataFrame(
        [(0, "q qqlowqq zzz")], "doc_id long, text string"
    )
    a = _segs(tx.unigram_lm_segments(new, model=model))
    b = _segs(tx.unigram_lm_segments(new, model=model))
    assert a == b
    for w, ps in a.items():
        assert "".join(ps) == w
    assert a["qqlowqq"] == ["q", "q", "low", "q", "q"]


# ---------------------------------------------------------------------------
# ADVICE r10 (low): hybrid retrieval fails loudly on a missing
# query_vec_id instead of silently degrading to lexical-only fusion
# ---------------------------------------------------------------------------


def test_hybrid_missing_query_vec_raises(spark):
    docs = spark.createDataFrame(
        [(0, "spark shuffles data"), (1, "ducks swim")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="query_vec_id=999"):
        rtv.hybrid_bm25_cosine_topk(
            docs, emb, ["spark"], query_vec_id=999
        )


def test_hybrid_present_query_vec_still_works(spark):
    docs = spark.createDataFrame(
        [(0, "spark shuffles data"), (1, "ducks swim"), (2, "spark rdd")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = rtv.hybrid_bm25_cosine_topk(
        docs, emb, ["spark"], query_vec_id=0, k=3
    ).collect()
    assert len(out) > 0
    by_id = {r["doc_id"]: r for r in out}
    # the dense ranker excludes the query vector's own id (the
    # cosine_topk convention) — doc 0 may still arrive lexically
    if 0 in by_id:
        assert by_id[0]["cosine_rank"] is None
    # and the dense side is NOT empty: some doc carries a cosine rank
    assert any(
        r["cosine_rank"] is not None for r in out
    ), "dense ranker contributed no items"


# ---------------------------------------------------------------------------
# Kneser-Ney trigram scorer (VERDICT r10 item 1 — the CCNet filter)
# ---------------------------------------------------------------------------


def _kn_reference(train_rows, score_rows, d=0.75):
    """Independent pure-Python interpolated-KN trigram scorer (the
    Chen & Goodman formulas written directly from the definitions —
    no shared code with the operator)."""
    import math
    from collections import Counter, defaultdict

    c3 = Counter()
    vocab = set()
    for t in train_rows:
        toks = t.split(" ")
        vocab.update(toks)
        for i in range(len(toks) - 2):
            c3[(toks[i], toks[i + 1], toks[i + 2])] += 1
    c12 = Counter()
    n12 = Counter()
    cc = Counter()
    for (w1, w2, w3), c in c3.items():
        c12[(w1, w2)] += c
        n12[(w1, w2)] += 1
        cc[(w2, w3)] += 1
    cx1 = Counter()
    n1 = Counter()
    cu = Counter()
    for (w2, w3), c in cc.items():
        cx1[w2] += c
        n1[w2] += 1
        cu[w3] += 1
    B = float(len(cc))
    W = float(len(cu))
    V = float(len(vocab))

    def p1(w3):
        return max(cu.get(w3, 0) - d, 0.0) / B + (d * W / B) * (1.0 / (V + 1.0))

    def p2(w2, w3):
        if w2 not in cx1:
            return p1(w3)
        return max(cc.get((w2, w3), 0) - d, 0.0) / cx1[w2] + (
            d * n1[w2] / cx1[w2]
        ) * p1(w3)

    def p3(w1, w2, w3):
        if (w1, w2) not in c12:
            return p2(w2, w3)
        k = (w1, w2)
        return max(c3.get((w1, w2, w3), 0) - d, 0.0) / c12[k] + (
            d * n12[k] / c12[k]
        ) * p2(w2, w3)

    out = {}
    for doc_id, t in enumerate(score_rows):
        toks = t.split(" ")
        lps = [
            math.log(p3(toks[i], toks[i + 1], toks[i + 2]))
            for i in range(len(toks) - 2)
        ]
        if not lps:
            out[doc_id] = (0, None, None)
            continue
        total = 0.0
        for x in lps:
            total += x
        avg = total / len(lps)
        out[doc_id] = (len(lps), round(avg, 6), round(math.exp(-avg), 6))
    return out


_KN_TRAIN = [
    "the cat sat on the mat",
    "the cat ate the fish on the mat",
    "the dog sat on the rug",
    "a dog ate a bone",
]


def test_kn_score_matches_hand_worked_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_KN_TRAIN)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logp"], r["ppl_proxy"])
        for r in tx.kneser_ney_score(docs).collect()
    }
    want = _kn_reference(_KN_TRAIN, _KN_TRAIN)
    assert got == want


def test_kn_score_docs_seam_total_on_unseen_text(spark):
    """Train on A, score B (the CCNet shape): unseen words/contexts
    back off to the uniform-floored unigram so every score is finite;
    score_docs=None is identical to score_docs=docs."""
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_KN_TRAIN)], "doc_id long, text string"
    )
    new_rows = [
        "the cat sat on the rug",          # seen-ish
        "zebra quagga okapi wildebeest",   # fully unseen
        "tiny",                            # < 3 tokens
    ]
    new = spark.createDataFrame(
        [(i, t) for i, t in enumerate(new_rows)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logp"], r["ppl_proxy"])
        for r in tx.kneser_ney_score(train, score_docs=new).collect()
    }
    want = _kn_reference(_KN_TRAIN, new_rows)
    assert got == want
    assert got[1][1] is not None  # unseen text still finite
    assert got[2] == (0, None, None)  # short doc: 0 trigrams, NULL scores
    # typical text scores better (lower ppl) than line noise
    assert got[0][2] < got[1][2]
    # default score target is the training corpus
    a = sorted(tuple(r) for r in tx.kneser_ney_score(train).collect())
    b = sorted(
        tuple(r)
        for r in tx.kneser_ney_score(train, score_docs=train).collect()
    )
    assert a == b


def test_kn_discount_validation(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="discount"):
        tx.kneser_ney_score(docs, discount=1.5)
    with pytest.raises(ValueError, match="discount"):
        tx.kneser_ney_score(docs, discount=0.0)


# ---------------------------------------------------------------------------
# Batch dense ANN (VERDICT r10 item 3 — the bm25_batch_topk contract
# applied to the dense ladder)
# ---------------------------------------------------------------------------


def _toy_emb(spark, n=40, dim=8):
    """Deterministic toy embeddings (LCG, no numpy dependency)."""
    rows = []
    x = 1
    for i in range(n):
        vec = []
        for _ in range(dim):
            x = (1103515245 * x + 12345) % (2**31)
            vec.append((x / 2**31) - 0.5)
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_batch_matches_python_reference(spark):
    import math

    emb = _toy_emb(spark)
    data = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    qids = [2, 9, 31]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    from dask_mwu_spark.operators import similarity as sim

    got = {}
    for r in sim.cosine_batch_topk(emb, queries, k=4).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["cosine"])
        )
    for q in qids:
        qv = data[q]
        qn = math.sqrt(sum(x * x for x in qv))
        scored = sorted(
            (
                (
                    -round(
                        sum(a * b for a, b in zip(v, qv))
                        / (math.sqrt(sum(x * x for x in v)) * qn),
                        6,
                    ),
                    i,
                )
                for i, v in data.items()
            ),
        )[:4]
        want = [(r + 1, i, -c) for r, (c, i) in enumerate(scored)]
        assert sorted(got[q]) == want, q
        # a corpus-drawn query returns itself at rank 1, cosine 1.0
        assert got[q][0] if False else True
        assert (1, q, 1.0) in got[q]


def test_ivf_batch_single_row_batches_equal_full_batch(spark):
    """The per-query independence invariant: a 3-query batch equals the
    union of three 1-query batches (the rank window is partitioned by
    query_id, so queries cannot interact)."""
    from dask_mwu_spark.operators import similarity as sim

    emb = _toy_emb(spark)
    qids = [5, 17, 33]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = sorted(
        tuple(r)
        for r in sim.ivf_batch_topk(
            emb, queries, n_centroids=8, n_probe=3, k=4
        ).collect()
    )
    singles = []
    for q in qids:
        singles.extend(
            tuple(r)
            for r in sim.ivf_batch_topk(
                emb,
                queries.where(F.col("query_id") == q),
                n_centroids=8,
                n_probe=3,
                k=4,
            ).collect()
        )
    assert full == sorted(singles)


def test_ivf_batch_full_probe_equals_brute(spark):
    """n_probe = n_centroids degenerates to the brute-force batch —
    the recall/cost dial's exactness endpoint."""
    from dask_mwu_spark.operators import similarity as sim

    emb = _toy_emb(spark)
    queries = emb.where(F.col("vec_id").isin([1, 22])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = sorted(
        tuple(r)
        for r in sim.ivf_batch_topk(
            emb, queries, n_centroids=8, n_probe=8, k=5
        ).collect()
    )
    brute = sorted(
        tuple(r)
        for r in sim.cosine_batch_topk(emb, queries, k=5).collect()
    )
    assert ivf == brute


def test_batch_query_table_validation(spark):
    from dask_mwu_spark.operators import similarity as sim

    emb = _toy_emb(spark, n=10)
    bad = spark.createDataFrame([(0, [1.0])], "qid long, vec array<double>")
    with pytest.raises(ValueError, match="query_id"):
        sim.cosine_batch_topk(emb, bad)
    ok = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="k must"):
        sim.cosine_batch_topk(emb, ok, k=0)
    with pytest.raises(ValueError, match="n_probe"):
        sim.ivf_batch_topk(emb, ok, n_probe=0)


# ---------------------------------------------------------------------------
# Incremental BM25 index maintenance (VERDICT r10 item 5)
# ---------------------------------------------------------------------------

_BM25_A = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles data across the cluster"),
    (2, "the fox and the dog became friends"),
]
_BM25_B = [
    (10, "a quick batch of new documents arrives"),
    (11, "the dog barks at the spark cluster"),
]


def _bm25_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_index_update_equals_full_rebuild(spark):
    """The batch twin: update(build(A), B) is row-identical to
    build(A UNION B) on every index table."""
    a = _bm25_docs(spark, _BM25_A)
    b = _bm25_docs(spark, _BM25_B)
    full = _bm25_docs(spark, _BM25_A + _BM25_B)
    inc = rtv.bm25_index_update(rtv.bm25_build_index(a), b)
    want = rtv.bm25_build_index(full)
    for got_t, want_t in zip(inc, want):
        assert sorted(map(tuple, got_t.collect())) == sorted(
            map(tuple, want_t.collect())
        )


def test_bm25_serve_from_updated_index_equals_direct(spark):
    """Scores served from the incrementally maintained index are
    bit-identical to bm25_topk over the full corpus."""
    from dask_mwu_spark.operators import text as txm

    a = _bm25_docs(spark, _BM25_A)
    b = _bm25_docs(spark, _BM25_B)
    full = _bm25_docs(spark, _BM25_A + _BM25_B)
    idx = rtv.bm25_index_update(rtv.bm25_build_index(a), b)
    terms = ["the", "dog", "spark"]
    got = sorted(
        tuple(r) for r in rtv.bm25_topk_from_index(idx, terms, k=5).collect()
    )
    want = sorted(
        tuple(r) for r in txm.bm25_topk(full, terms, k=5).collect()
    )
    assert got == want


def test_bm25_index_update_rejects_duplicate_doc_id(spark):
    a = _bm25_docs(spark, _BM25_A)
    dup = _bm25_docs(spark, [(1, "doc id one again")])
    idx = rtv.bm25_build_index(a)
    with pytest.raises(ValueError, match="append-only"):
        rtv.bm25_index_update(idx, dup)
    # and the escape hatch skips the probe
    out = rtv.bm25_index_update(idx, dup, check_disjoint=False)
    assert out.postings.count() > 0


def test_bm25_index_two_sequential_batches(spark):
    """Chained updates (the continuous-ingest shape) still equal one
    full rebuild."""
    a = _bm25_docs(spark, _BM25_A)
    b1 = _bm25_docs(spark, _BM25_B[:1])
    b2 = _bm25_docs(spark, _BM25_B[1:])
    full = _bm25_docs(spark, _BM25_A + _BM25_B)
    idx = rtv.bm25_index_update(
        rtv.bm25_index_update(rtv.bm25_build_index(a), b1), b2
    )
    terms = ["the", "quick", "cluster"]
    got = sorted(
        tuple(r) for r in rtv.bm25_topk_from_index(idx, terms, k=10).collect()
    )
    from dask_mwu_spark.operators import text as txm

    want = sorted(
        tuple(r) for r in txm.bm25_topk(full, terms, k=10).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance (the bm25_index_update story for
# the dense ladder)
# ---------------------------------------------------------------------------


def _fixed_cents(emb, n=8):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )


def test_ivf_index_update_equals_full_rebuild(spark):
    """The fixed-centroid batch twin: update(index(A), B) is
    row-identical to ivf_index(A UNION B) with the same centroids."""
    from dask_mwu_spark.operators import similarity as sim

    emb = _toy_emb(spark, n=60)
    a = emb.where(F.col("vec_id") < 40)
    b = emb.where(F.col("vec_id") >= 40)
    cents = _fixed_cents(emb)
    inc = sim.ivf_index_update(
        sim.ivf_index(a, centroids=cents), b, centroids=cents
    )
    want = sim.ivf_index(emb, centroids=cents)
    key = lambda r: (r["vec_id"], r["cent_id"])
    assert sorted(map(key, inc.collect())) == sorted(
        map(key, want.collect())
    )


def test_ivf_serve_from_updated_index_equals_rebuild(spark):
    from dask_mwu_spark.operators import similarity as sim

    emb = _toy_emb(spark, n=60)
    a = emb.where(F.col("vec_id") < 40)
    b = emb.where(F.col("vec_id") >= 40)
    cents = _fixed_cents(emb)
    queries = emb.where(F.col("vec_id").isin([5, 23, 51])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = sim.ivf_index_update(
        sim.ivf_index(a, centroids=cents), b, centroids=cents
    )
    got = sorted(
        tuple(r)
        for r in sim.ivf_batch_topk(
            emb, queries, index=idx, centroids=cents, n_probe=3, k=4
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in sim.ivf_batch_topk(
            emb, queries, centroids=cents, n_probe=3, k=4
        ).collect()
    )
    assert got == want


def test_ivf_index_update_rejects_duplicate_vec_id(spark):
    from dask_mwu_spark.operators import similarity as sim

    emb = _toy_emb(spark, n=30)
    cents = _fixed_cents(emb)
    idx = sim.ivf_index(emb, centroids=cents)
    dup = emb.where(F.col("vec_id") == 7)
    with pytest.raises(ValueError, match="append-only"):
        sim.ivf_index_update(idx, dup, centroids=cents)
    bad = spark.createDataFrame([(0, 1)], "vec_id long, cent_id long")
    with pytest.raises(ValueError, match="ivf_index schema"):
        sim.ivf_index_update(bad, dup, centroids=cents)


# ---------------------------------------------------------------------------
# Positional phrase search (the match_phrase shape)
# ---------------------------------------------------------------------------


def test_phrase_search_hand_worked(spark):
    docs = spark.createDataFrame(
        [
            (0, "sort merge join beats hash join here"),
            (1, "merge sort is not sort merge"),
            (2, "batch batch batch batch"),
            (3, "no hits at all"),
        ],
        "doc_id long, text string",
    )
    phrases = ["sort merge", "sort merge join", "batch batch", "zz qq"]
    got = {
        (r["phrase_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in rtv.phrase_search(docs, phrases).collect()
    }
    assert got == {
        (0, 0): (1, 0),  # 'sort merge' once in doc 0 at pos 0
        (0, 1): (1, 4),  # ...and once in doc 1 at pos 4 (word order matters)
        (1, 0): (1, 0),  # the trigram only in doc 0
        (2, 2): (3, 0),  # OVERLAPPING: 'batch batch' x3 in 4 tokens
    }
    # phrase strings ride through
    by_pid = {
        r["phrase_id"]: r["phrase"]
        for r in rtv.phrase_search(docs, phrases).collect()
    }
    assert by_pid[0] == "sort merge"


def test_phrase_match_positions_overlap_and_order(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b a")], "doc_id long, text string"
    )
    pos = sorted(
        (r["phrase_id"], r["start_pos"])
        for r in rtv.phrase_match_positions(docs, ["a b a"]).collect()
    )
    assert pos == [(0, 0), (0, 2)]  # overlapping occurrences both emit


def test_phrase_search_validation(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one"):
        rtv.phrase_search(docs, [])
    with pytest.raises(ValueError, match="empty"):
        rtv.phrase_search(docs, ["a  b"])
    with pytest.raises(ValueError, match="empty"):
        rtv.phrase_search(docs, [""])


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity bucketing
# ---------------------------------------------------------------------------


def test_kn_buckets_tertiles_hand_worked(spark):
    """Six scored docs split 2/2/2 by exact tertile thresholds; the
    short doc lands in 'unscored'."""
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the mat"),          # same text -> same ppl
        (2, "the dog ate the fish on the rug"),
        (3, "a dog ate a bone on a mat"),
        (4, "zebra cat quagga dog okapi fish"), # noisy -> high ppl
        (5, "fish bone rug zebra a the on"),
        (6, "tiny"),                            # < 3 tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.kn_perplexity_buckets(docs).collect()}
    assert out[6]["bucket"] == "unscored" and out[6]["ppl_proxy"] is None
    scored = {d: r for d, r in out.items() if d != 6}
    # identical text -> identical ppl -> identical bucket
    assert out[0]["ppl_proxy"] == out[1]["ppl_proxy"]
    assert out[0]["bucket"] == out[1]["bucket"]
    # buckets respect the ppl ordering: every head ppl <= every middle
    # ppl <= every tail ppl
    by_bucket = {}
    for r in scored.values():
        by_bucket.setdefault(r["bucket"], []).append(r["ppl_proxy"])
    for lo, hi in (("head", "middle"), ("middle", "tail")):
        if lo in by_bucket and hi in by_bucket:
            assert max(by_bucket[lo]) <= min(by_bucket[hi])
    # the independently computed tertiles reproduce the split
    import statistics

    ppls = sorted(r["ppl_proxy"] for r in scored.values())
    qs = statistics.quantiles(ppls, n=3, method="inclusive")
    t1, t2 = round(qs[0], 6), round(qs[1], 6)
    for r in scored.values():
        want = (
            "head" if r["ppl_proxy"] <= t1
            else "middle" if r["ppl_proxy"] <= t2
            else "tail"
        )
        assert r["bucket"] == want, r


def test_kn_buckets_score_docs_seam(spark):
    """Thresholds derive from the SCORED corpus; training stays on
    docs — the CCNet shape (train wiki, bucket crawl)."""
    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "a dog ate a bone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "the cat sat on a bone"), (11, "okapi zebra quagga wombat")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["bucket"]
        for r in tx.kn_perplexity_buckets(train, score_docs=new).collect()
    }
    assert set(out) == {10, 11}
    # the reference-like doc buckets no worse than the noise doc
    order = {"head": 0, "middle": 1, "tail": 2}
    assert order[out[10]] <= order[out[11]]


def test_bm25_index_empty_batch_is_noop(spark):
    """An empty append batch must leave the served scores unchanged —
    before the coalesce fix, SUM(dl) over the empty batch was NULL and
    the stats addition NULL-poisoned avgdl (and every score)."""
    a = _bm25_docs(spark, _BM25_A)
    empty = _bm25_docs(spark, []).where(F.lit(False))
    idx = rtv.bm25_index_update(
        rtv.bm25_build_index(a), empty, check_disjoint=False
    )
    stats = idx.stats.collect()[0]
    assert (stats["n_docs"], stats["sum_dl"]) == (3, 22)
    from dask_mwu_spark.operators import text as txm

    got = sorted(
        tuple(r)
        for r in rtv.bm25_topk_from_index(idx, ["the", "dog"], k=5).collect()
    )
    want = sorted(
        tuple(r) for r in txm.bm25_topk(a, ["the", "dog"], k=5).collect()
    )
    assert got == want
