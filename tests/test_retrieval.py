"""Hybrid retrieval (reciprocal-rank fusion) tests."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_mwu_spark.operators import retrieval as rtv


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_rrf_fuse_hand_worked(spark):
    """Cormack et al. fusion on two 3-item lists: doc 1 is rank 1 in A
    and rank 2 in B -> 1/61 + 1/62; doc 2 only in A at rank 2 -> 1/62;
    doc 3 only in B at rank 1 -> 1/61; doc 4 in both at rank 3 ->
    2/63.  Fused order: doc 1 (.032524), doc 4 (.031746), doc 3
    (.016393), doc 2 (.016129)."""
    a = _ranked(spark, [(1, 1), (2, 2), (4, 3)])
    b = _ranked(spark, [(3, 1), (1, 2), (4, 3)])
    out = rtv.rrf_fuse({"a": a, "b": b}, k=10).collect()
    got = [(r["doc_id"], r["rank"], r["n_lists"]) for r in out]
    assert got == [(1, 1, 2), (4, 2, 2), (3, 3, 1), (2, 4, 1)]
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["a_rank"] == 1 and by_id[1]["b_rank"] == 2
    assert by_id[2]["b_rank"] is None and by_id[3]["a_rank"] is None
    assert by_id[1]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
    assert by_id[4]["rrf_score"] == round(2 / 63, 6)


def test_rrf_fuse_equal_scores_tiebreak_by_id(spark):
    """Items appearing in exactly one list at the same rank score
    identically — the id tiebreak pins the fused order."""
    a = _ranked(spark, [(9, 1)])
    b = _ranked(spark, [(3, 1)])
    out = rtv.rrf_fuse({"a": a, "b": b}, k=10).collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(3, 1), (9, 2)]


def test_rrf_fuse_k_truncates(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 8)])
    out = rtv.rrf_fuse({"a": a}, k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]


def test_rrf_fuse_validation(spark):
    a = _ranked(spark, [(1, 1)])
    with pytest.raises(ValueError, match="at least one"):
        rtv.rrf_fuse({})
    with pytest.raises(ValueError, match="k_rrf"):
        rtv.rrf_fuse({"a": a}, k_rrf=0)
    with pytest.raises(ValueError, match="k must"):
        rtv.rrf_fuse({"a": a}, k=0)
    bad = a.withColumnRenamed("rank", "position")
    with pytest.raises(ValueError, match="rank"):
        rtv.rrf_fuse({"bad": bad})


def test_hybrid_matches_python_twin(spark, sf_dir):
    """End-to-end hybrid on the real tables vs an independent pandas
    twin (pandas BM25 + numpy cosine + dict-based RRF)."""
    import math

    import numpy as np
    import pandas as pd

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    terms = ["the", "fast", "datos", "row"]
    got = [
        (r["doc_id"], r["bm25_rank"], r["cosine_rank"], r["rrf_score"], r["rank"])
        for r in rtv.hybrid_bm25_cosine_topk(
            docs, emb, terms, query_vec_id=0, k=10, depth=20
        ).collect()
    ]

    pdocs = docs.select("doc_id", "text").toPandas()
    toks = {
        int(r.doc_id): r.text.split(" ") for r in pdocs.itertuples()
    }
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf = {}
    for d, words in toks.items():
        for w in words:
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df_ = {}
    for (d, w), _c in tf.items():
        df_[w] = df_.get(w, 0) + 1
    per = {}
    for d in {d for d, _w in tf}:
        s = 0.0
        for w in sorted(terms):
            if (d, w) in tf:
                c = tf[(d, w)]
                idf = math.log((n_docs - df_[w] + 0.5) / (df_[w] + 0.5) + 1.0)
                dl = len(toks[d])
                s += idf * c * 2.2 / (c + 1.2 * (0.25 + 0.75 * dl / avgdl))
        per[d] = round(s, 6)
    bm = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    bm_rank = {d: i + 1 for i, (d, _s) in enumerate(bm)}

    pemb = emb.select("vec_id", "embedding").toPandas()
    vec = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in pemb.itertuples()
    }
    q = vec[0]
    qn = math.sqrt(float((q * q).sum()))
    cos = {}
    for d in toks:
        if d == 0 or d not in vec:
            continue
        v = vec[d]
        cos[d] = round(
            float((v * q).sum()) / (math.sqrt(float((v * v).sum())) * qn), 6
        )
    dn = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    dn_rank = {d: i + 1 for i, (d, _c) in enumerate(dn)}

    fused = {}
    for d in set(bm_rank) | set(dn_rank):
        s = (1.0 / (60 + bm_rank[d]) if d in bm_rank else 0.0) + (
            1.0 / (60 + dn_rank[d]) if d in dn_rank else 0.0
        )
        fused[d] = round(s, 6)
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [
        (d, bm_rank.get(d), dn_rank.get(d), s, i + 1)
        for i, (d, s) in enumerate(top)
    ]
    assert got == want


def test_hybrid_fuses_ann_list(spark, sf_dir):
    """The scale path: an ANN ladder output (LSH top-k for one query)
    plugs into rrf_fuse unchanged — fusion only sees ranked lists."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dask_mwu_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    ann = sim.lsh_cosine_topk(emb, n_queries=1, k=10).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(w).cast("long").alias("rank"),
    )
    lex = _ranked(spark, [(1, 1), (2, 2)])
    out = rtv.rrf_fuse({"bm25": lex, "ann": ann}, k=5).collect()
    assert len(out) == 5
    assert all(r["n_lists"] in (1, 2) for r in out)


# ---------------------------------------------------------------------------
# batch BM25 (the multi-query production shape)
# ---------------------------------------------------------------------------


def test_bm25_batch_query0_matches_single(spark, sf_dir):
    """Each batch query scores exactly as the single-query operator run
    alone (same corpus statistics, same fold order): query 0 uses the
    registered single-query terms and must reproduce its table."""
    from pyspark.sql import functions as F

    from dask_mwu_spark.operators import text as tx

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    terms = ["the", "fast", "datos", "row"]
    single = [
        (r["doc_id"], r["score"], r["n_terms_hit"], r["rank"])
        for r in tx.bm25_topk(docs, terms, k=10).collect()
    ]
    q = spark.createDataFrame(
        [(0, t) for t in terms] + [(1, "spark"), (1, "join")],
        "query_id long, word string",
    )
    batch = [
        (r["doc_id"], r["score"], r["n_terms_hit"], r["rank"])
        for r in tx.bm25_batch_topk(docs, q, k=10)
        .where(F.col("query_id") == 0)
        .orderBy("rank")
        .collect()
    ]
    assert batch == single


def test_bm25_batch_dedupes_query_words_and_validates(spark):
    from dask_mwu_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b b c")], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(0, "b"), (0, "b"), (0, "c")], "query_id long, word string"
    )
    dup = tx.bm25_batch_topk(docs, q, k=5).collect()
    q1 = spark.createDataFrame(
        [(0, "b"), (0, "c")], "query_id long, word string"
    )
    clean = tx.bm25_batch_topk(docs, q1, k=5).collect()
    assert sorted(map(tuple, dup)) == sorted(map(tuple, clean))
    with pytest.raises(ValueError, match="query_id"):
        tx.bm25_batch_topk(docs, q.withColumnRenamed("query_id", "qid"))
    with pytest.raises(ValueError, match="k must"):
        tx.bm25_batch_topk(docs, q, k=0)


def test_bm25_batch_plan_is_partitioned_and_broadcast(spark, sf_dir):
    """The scale contract: the rank window is PARTITIONED by query_id
    (no unpartitioned ordered window anywhere) and the vocabulary /
    query fan-out joins are broadcast, never a shuffled SortMergeJoin
    of the token stream."""
    import re

    from dask_mwu_spark.operators import text as tx

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    q = spark.createDataFrame(
        [(0, "the"), (1, "fast")], "query_id long, word string"
    )
    plan = (
        tx.bm25_batch_topk(docs, q, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        head = spec.split("specifiedwindowframe")[0]
        if " ASC" in head or " DESC" in head:
            first = head.split(",")[0].strip()
            assert not first.endswith(
                ("ASC NULLS FIRST", "DESC NULLS LAST")
            ), plan


# ---------------------------------------------------------------------------
# property tests (hypothesis) — fusion math and batch/single equivalence
# ---------------------------------------------------------------------------


def test_rrf_fuse_property_matches_python_twin(spark):
    """Random ranker sets vs a dict-based RRF twin: scores, per-list
    ranks, n_lists, and the fused order (incl. the id tiebreak on
    equal rounded scores) must all agree."""
    from hypothesis import given, settings, strategies as st

    ranker = st.lists(
        st.integers(0, 9), min_size=1, max_size=8, unique=True
    )

    @settings(max_examples=20, deadline=None)
    @given(lists=st.lists(ranker, min_size=1, max_size=3), k=st.integers(1, 12))
    def run(lists, k):
        named = {
            f"r{i}": _ranked(spark, [(d, p + 1) for p, d in enumerate(ids)])
            for i, ids in enumerate(lists)
        }
        got = [
            (r["doc_id"], r["rrf_score"], r["n_lists"], r["rank"])
            for r in rtv.rrf_fuse(named, k=k).collect()
        ]
        ranks = [
            {d: p + 1 for p, d in enumerate(ids)} for ids in lists
        ]
        fused = {}
        for d in {d for ids in lists for d in ids}:
            s = sum(1.0 / (60 + rk[d]) for rk in ranks if d in rk)
            fused[d] = (round(s, 6), sum(1 for rk in ranks if d in rk))
        top = sorted(fused.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        want = [(d, s, n, i + 1) for i, (d, (s, n)) in enumerate(top)]
        assert got == want

    run()


def test_bm25_batch_property_matches_single(spark):
    """Random tiny corpora + query bags: every batch query's table is
    bit-identical to the single-query operator run alone."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    from dask_mwu_spark.operators import text as tx

    word = st.sampled_from(["a", "b", "c", "d"])
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)
    bag = st.lists(word, min_size=1, max_size=3, unique=True)

    @settings(max_examples=12, deadline=None)
    @given(texts=st.lists(doc, min_size=2, max_size=4), bags=st.lists(bag, min_size=1, max_size=2))
    def run(texts, bags):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        q = spark.createDataFrame(
            [(qi, w) for qi, ws in enumerate(bags) for w in ws],
            "query_id long, word string",
        )
        batch = tx.bm25_batch_topk(docs, q, k=5).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["score"], r["n_terms_hit"])
            )
        for qi, ws in enumerate(bags):
            single = [
                (r["rank"], r["doc_id"], r["score"], r["n_terms_hit"])
                for r in tx.bm25_topk(docs, list(ws), k=5).collect()
            ]
            assert sorted(by_q.get(qi, [])) == sorted(single), (texts, ws)

    run()
