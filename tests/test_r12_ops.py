"""Round-12 regression tests.

Covers VERDICT r11 item 1 (index-maintenance DELETE for the
incremental BM25 and IVF indices: delete-then-serve must equal the
rebuild on the remaining corpus) and the contract guards around it
(check_present, df-reaches-zero vocabulary pruning, batch-dup
dedupe, required-centroids on injected indices).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import retrieval as rtv
from dask_mwu_spark.operators import similarity as sim
from dask_mwu_spark.operators import text as tx


def _docs(spark):
    rows = [
        (0, "the fast cat sat on the mat"),
        (1, "a slow dog ran past the fast cat"),
        (2, "rare unicorn word appears here only"),
        (3, "the mat was flat and the cat sat"),
        (4, "fast fast fast row row the"),
        (5, "another plain document about a dog"),
        (6, "the quick brown fox and the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _index_rows(idx):
    """Materialize a BM25Index into comparable sorted tuples."""
    return {
        "postings": sorted(tuple(r) for r in idx.postings.collect()),
        "doclens": sorted(tuple(r) for r in idx.doclens.collect()),
        "df": sorted(tuple(r) for r in idx.df.collect()),
        "stats": sorted(tuple(r) for r in idx.stats.collect()),
    }


# ---------------------------------------------------------------------------
# BM25 delete == rebuild
# ---------------------------------------------------------------------------


def test_bm25_delete_equals_rebuild(spark):
    """Every index table after delete matches the rebuild on the
    remaining corpus, and the served top-k is row-identical."""
    docs = _docs(spark)
    full = rtv.bm25_build_index(docs)
    deleted = docs.where(F.col("doc_id").isin(1, 4)).select("doc_id")
    after = rtv.bm25_index_delete(full, deleted)
    rebuilt = rtv.bm25_build_index(docs.where(~F.col("doc_id").isin(1, 4)))
    assert _index_rows(after) == _index_rows(rebuilt)
    terms = ["the", "fast", "dog"]
    got = sorted(
        tuple(r) for r in rtv.bm25_topk_from_index(after, terms).collect()
    )
    want = sorted(
        tuple(r) for r in rtv.bm25_topk_from_index(rebuilt, terms).collect()
    )
    assert got == want


def test_bm25_delete_prunes_vocabulary_to_zero_df(spark):
    """Deleting the only doc containing a word removes the word from
    df entirely (the rebuild's vocabulary), not a df=0 row."""
    docs = _docs(spark)
    full = rtv.bm25_build_index(docs)
    after = rtv.bm25_index_delete(
        full, docs.where(F.col("doc_id") == 2).select("doc_id")
    )
    assert after.df.where(F.col("word") == "unicorn").count() == 0
    assert after.df.where(F.col("df") <= 0).count() == 0


def test_bm25_delete_batch_duplicates_do_not_double_decrement(spark):
    """An id listed twice in the batch decrements once."""
    docs = _docs(spark)
    full = rtv.bm25_build_index(docs)
    dup_batch = spark.createDataFrame([(3,), (3,)], "doc_id long")
    after = rtv.bm25_index_delete(full, dup_batch)
    rebuilt = rtv.bm25_build_index(docs.where(F.col("doc_id") != 3))
    assert _index_rows(after) == _index_rows(rebuilt)


def test_bm25_delete_everything_yields_empty_index(spark):
    docs = _docs(spark)
    full = rtv.bm25_build_index(docs)
    after = rtv.bm25_index_delete(full, docs.select("doc_id"))
    assert after.postings.count() == 0
    assert after.df.count() == 0
    n_docs, sum_dl = after.stats.first()
    assert (n_docs, sum_dl) == (0, 0)


def test_bm25_delete_unknown_id_raises_and_flag_disables(spark):
    docs = _docs(spark)
    full = rtv.bm25_build_index(docs)
    ghost = spark.createDataFrame([(99,)], "doc_id long")
    with pytest.raises(ValueError, match="not in the index"):
        rtv.bm25_index_delete(full, ghost)
    # idempotent mode: unknown id no-ops, index unchanged
    after = rtv.bm25_index_delete(full, ghost, check_present=False)
    assert _index_rows(after) == _index_rows(full)


def test_bm25_update_then_delete_round_trip(spark):
    """Append a batch, then delete it again — the index returns to the
    original build (the full maintenance cycle)."""
    docs = _docs(spark)
    base = docs.where(F.col("doc_id") < 5)
    batch = docs.where(F.col("doc_id") >= 5)
    idx = rtv.bm25_index_update(rtv.bm25_build_index(base), batch)
    back = rtv.bm25_index_delete(idx, batch.select("doc_id"))
    assert _index_rows(back) == _index_rows(rtv.bm25_build_index(base))


# ---------------------------------------------------------------------------
# IVF delete == rebuild
# ---------------------------------------------------------------------------


def _emb(spark, n=40, dim=8):
    rows = [
        (
            i,
            [
                round(((i * 37 + d * 11 + 3) % 97) / 97.0 - 0.5, 6)
                for d in range(dim)
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_delete_equals_rebuild(spark):
    emb = _emb(spark)
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    full = sim.ivf_index(emb, centroids=cents)
    deleted = emb.where(F.col("vec_id") % 3 == 0).select("vec_id")
    after = sim.ivf_index_delete(full, deleted)
    rebuilt = sim.ivf_index(
        emb.where(F.col("vec_id") % 3 != 0), centroids=cents
    )
    got = sorted((r["vec_id"], r["cent_id"]) for r in after.collect())
    want = sorted((r["vec_id"], r["cent_id"]) for r in rebuilt.collect())
    assert got == want


def test_ivf_delete_then_serve_equals_rebuild_serve(spark):
    emb = _emb(spark)
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    queries = emb.where(F.col("vec_id").isin(1, 7)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    after = sim.ivf_index_delete(
        sim.ivf_index(emb, centroids=cents),
        emb.where(F.col("vec_id") % 3 == 0).select("vec_id"),
    )
    got = sorted(
        tuple(r)
        for r in sim.ivf_batch_topk(
            emb, queries, index=after, centroids=cents, k=3
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in sim.ivf_batch_topk(
            emb.where(F.col("vec_id") % 3 != 0),
            queries,
            centroids=cents,
            k=3,
        ).collect()
    )
    assert got == want


def test_ivf_delete_unknown_id_raises_and_flag_disables(spark):
    emb = _emb(spark)
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    full = sim.ivf_index(emb, centroids=cents)
    ghost = spark.createDataFrame([(999,)], "vec_id long")
    with pytest.raises(ValueError, match="not in the index"):
        sim.ivf_index_delete(full, ghost)
    after = sim.ivf_index_delete(full, ghost, check_present=False)
    assert after.count() == full.count()


def test_ivf_delete_rejects_wrong_schema(spark):
    bad = spark.createDataFrame([(1, 2)], "vec_id long, cent_id long")
    dl = spark.createDataFrame([(1,)], "vec_id long")
    with pytest.raises(ValueError, match="missing columns"):
        sim.ivf_index_delete(bad, dl)


# ---------------------------------------------------------------------------
# Modified Kneser-Ney (VERDICT r11 item 4)
# ---------------------------------------------------------------------------


def _mkn_reference(train_rows, score_rows):
    """Independent pure-Python MODIFIED-KN trigram scorer — the Chen &
    Goodman §2.7 formulas with KenLM's --discount_fallback policy,
    written from the definitions with no shared code with the
    operator.  Returns (per_doc, ok_flags)."""
    import math
    from collections import Counter

    c3 = Counter()
    vocab = set()
    for t in train_rows:
        toks = t.split(" ")
        vocab.update(toks)
        for i in range(len(toks) - 2):
            c3[(toks[i], toks[i + 1], toks[i + 2])] += 1
    c12, j1, j2, j3p = Counter(), Counter(), Counter(), Counter()
    cc = Counter()
    for (w1, w2, w3), c in c3.items():
        c12[(w1, w2)] += c
        if c == 1:
            j1[(w1, w2)] += 1
        elif c == 2:
            j2[(w1, w2)] += 1
        else:
            j3p[(w1, w2)] += 1
        cc[(w2, w3)] += 1
    cx1, k1, k2, k3p = Counter(), Counter(), Counter(), Counter()
    cu = Counter()
    for (w2, w3), c in cc.items():
        cx1[w2] += c
        if c == 1:
            k1[w2] += 1
        elif c == 2:
            k2[w2] += 1
        else:
            k3p[w2] += 1
        cu[w3] += 1
    B = float(len(cc))
    V = float(len(vocab))

    def discounts(values):
        n = Counter(values)
        n1, n2, n3, n4 = (
            float(n[1]), float(n[2]), float(n[3]), float(n[4])
        )
        ok = n1 > 0 and n2 > 0 and n3 > 0
        if ok:
            y = n1 / (n1 + 2.0 * n2)
            d1 = 1.0 - 2.0 * y * (n2 / n1)
            d2 = 2.0 - 3.0 * y * (n3 / n2)
            d3 = 3.0 - 4.0 * y * (n4 / n3)
            ok = (
                0.0 <= d1 <= 1.0 and 0.0 <= d2 <= 2.0 and 0.0 <= d3 <= 3.0
            )
        if not ok:
            return (0.5, 1.0, 1.5), False
        return (d1, d2, d3), True

    ds3, ok3 = discounts(c3.values())
    ds2, ok2 = discounts(cc.values())
    ds1, ok1 = discounts(cu.values())
    u_n = Counter(cu.values())
    u1c, u2c = float(u_n[1]), float(u_n[2])
    u3pc = float(sum(1 for v in cu.values() if v >= 3))
    g1 = ds1[0] * u1c + ds1[1] * u2c + ds1[2] * u3pc

    def dsel(c, ds):
        return ds[2] if c >= 3 else (ds[1] if c == 2 else ds[0])

    def p1(w3):
        c = cu.get(w3, 0)
        return (max(c - dsel(c, ds1), 0.0) / B) + (
            (g1 / B) * (1.0 / (V + 1.0))
        )

    def p2(w2, w3):
        if w2 not in cx1:
            return p1(w3)
        c = cc.get((w2, w3), 0)
        g2 = ds2[0] * k1[w2] + ds2[1] * k2[w2] + ds2[2] * k3p[w2]
        return (max(c - dsel(c, ds2), 0.0) / cx1[w2]) + (
            (g2 / cx1[w2]) * p1(w3)
        )

    def p3(w1, w2, w3):
        if (w1, w2) not in c12:
            return p2(w2, w3)
        k = (w1, w2)
        c = c3.get((w1, w2, w3), 0)
        g3 = ds3[0] * j1[k] + ds3[1] * j2[k] + ds3[2] * j3p[k]
        return (max(c - dsel(c, ds3), 0.0) / c12[k]) + (
            (g3 / c12[k]) * p2(w2, w3)
        )

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
    return out, (ok3, ok2, ok1)


_MKN_TRAIN = [
    # repeated sentences plant trigram counts 1, 2, and 3+ so the
    # order-3 discounts genuinely estimate (asserted below)
    "the cat sat on the mat",
    "the cat sat on the mat",
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the dog sat on the rug",
    "a dog ate a bone",
    "a cat ate the fish",
    "the fish swam in the pond",
    "a bird flew over the pond",
    "the bird ate the fish on the mat",
]


def test_kn_modified_matches_hand_worked_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_MKN_TRAIN)],
        "doc_id long, text string",
    )
    want, (ok3, ok2, ok1) = _mkn_reference(_MKN_TRAIN, _MKN_TRAIN)
    # the fixture must exercise genuine estimation at order 3 AND the
    # fallback path at order 1 (continuation-unigram counts too flat)
    assert ok3, "fixture no longer estimates order-3 discounts"
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logp"], r["ppl_proxy"])
        for r in tx.kneser_ney_score(docs, discount="estimate").collect()
    }
    assert got == want


def test_kn_modified_differs_from_fixed_and_scores_unseen(spark):
    """Estimated discounts actually change scores vs fixed D=0.75, the
    score_docs seam stays total on unseen text, and short docs keep
    NULL scores."""
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_MKN_TRAIN)],
        "doc_id long, text string",
    )
    fixed = {
        r["doc_id"]: r["avg_logp"]
        for r in tx.kneser_ney_score(train).collect()
    }
    est = {
        r["doc_id"]: r["avg_logp"]
        for r in tx.kneser_ney_score(train, discount="estimate").collect()
    }
    assert any(fixed[k] != est[k] for k in fixed)
    new_rows = ["zebra quagga okapi wildebeest", "tiny"]
    new = spark.createDataFrame(
        [(i, t) for i, t in enumerate(new_rows)],
        "doc_id long, text string",
    )
    want, _ = _mkn_reference(_MKN_TRAIN, new_rows)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logp"], r["ppl_proxy"])
        for r in tx.kneser_ney_score(
            train, discount="estimate", score_docs=new
        ).collect()
    }
    assert got == want
    assert got[0][1] is not None
    assert got[1] == (0, None, None)


def test_kn_modified_fallback_on_tiny_corpus(spark):
    """A corpus whose count-of-counts cannot support estimation at ANY
    order must still score (all orders on the KenLM fallback
    discounts), not throw or emit NULLs."""
    rows = ["a b c d e", "f g h i j"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    want, (ok3, ok2, ok1) = _mkn_reference(rows, rows)
    assert not (ok3 or ok2 or ok1)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logp"], r["ppl_proxy"])
        for r in tx.kneser_ney_score(docs, discount="estimate").collect()
    }
    assert got == want
    assert all(v[1] is not None for v in got.values())


def test_kn_discount_string_validation(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="estimate"):
        tx.kneser_ney_score(docs, discount="estimat")


# ---------------------------------------------------------------------------
# Proximity phrase search (VERDICT r11 item 3)
# ---------------------------------------------------------------------------


def _phrase_docs(spark):
    rows = [
        (0, "sort merge join is a sort x merge join"),
        (1, "a c b"),
        (2, "b x a"),
        (3, "sort x merge"),
        (4, "batch batch batch"),
        (5, "merge sort"),
        (6, "sort y y merge"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_slop_zero_degenerates_to_exact(spark):
    """slop=0 output is row-identical to phrase_search — on the
    planted corpus AND on a pseudo-random one (overlaps, repeats)."""
    import random

    docs = _phrase_docs(spark)
    phrases = ["sort merge", "batch batch", "merge join", "a b c"]
    exact = sorted(
        tuple(r) for r in rtv.phrase_search(docs, phrases).collect()
    )
    slop0 = sorted(
        tuple(r)
        for r in rtv.phrase_search_slop(docs, phrases, slop=0).collect()
    )
    assert exact == slop0 and len(exact) > 0

    rnd = random.Random(5)
    vocab = ["a", "b", "c", "d"]
    rdocs = spark.createDataFrame(
        [
            (i, " ".join(rnd.choice(vocab) for _ in range(30)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    rphr = ["a b", "b b", "c a d", "a a a"]
    exact = sorted(
        tuple(r) for r in rtv.phrase_search(rdocs, rphr).collect()
    )
    slop0 = sorted(
        tuple(r)
        for r in rtv.phrase_search_slop(rdocs, rphr, slop=0).collect()
    )
    assert exact == slop0 and len(exact) > 0


def test_phrase_slop_ordered_window_semantics(spark):
    """Positive matches within the gap budget; the two relaxation
    counterexamples (out-of-order, repeated-word double-count) must
    NOT match."""
    docs = _phrase_docs(spark)
    got = sorted(
        tuple(r)
        for r in rtv.phrase_match_positions_slop(
            docs, ["sort merge"], slop=1
        ).collect()
    )
    # doc0: exact at 0 and gapped at 5; doc3: gapped at 0; doc6's gap
    # of 2 exceeds slop=1
    assert got == [(0, 0, 0), (0, 0, 5), (0, 3, 0)]
    got2 = sorted(
        tuple(r)
        for r in rtv.phrase_match_positions_slop(
            docs, ["sort merge"], slop=2
        ).collect()
    )
    assert (0, 6, 0) in got2
    # out-of-order: "a b c" over "a c b" never matches at any slop
    assert (
        rtv.phrase_match_positions_slop(
            docs.where(F.col("doc_id") == 1), ["a b c"], slop=2
        ).count()
        == 0
    )
    # repeated word: "b a a" over "b x a" has only ONE a — the single
    # token must not satisfy both offsets
    assert (
        rtv.phrase_match_positions_slop(
            docs.where(F.col("doc_id") == 2), ["b a a"], slop=1
        ).count()
        == 0
    )


def test_phrase_slop_overlaps_and_counts(spark):
    """Overlapping anchors all emit; n_matches/first_pos aggregate
    them like phrase_search."""
    docs = _phrase_docs(spark)
    out = {
        (r["phrase"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in rtv.phrase_search_slop(
            docs, ["batch batch"], slop=1
        ).collect()
    }
    # "batch batch batch": anchors 0 and 1 both match
    assert out[("batch batch", 4)] == (2, 0)


def test_phrase_slop_validation(spark):
    docs = _phrase_docs(spark)
    with pytest.raises(ValueError, match="slop"):
        rtv.phrase_search_slop(docs, ["a b"], slop=-1)
    with pytest.raises(ValueError, match="empty"):
        rtv.phrase_search_slop(docs, [""], slop=1)
    with pytest.raises(ValueError, match="at least one"):
        rtv.phrase_search_slop(docs, [], slop=1)


# ---------------------------------------------------------------------------
# Residual IVF-PQ (VERDICT r11 item 2)
# ---------------------------------------------------------------------------


def _clustered_vectors(n=200, n_clusters=16, dim=64, scale=0.35):
    """Vectors with STRONG coarse-cluster structure and codable
    residuals — the regime residual PQ is built for: raw-vector
    codebooks burn their 16 codes/subspace re-encoding the cluster
    mean, residual codebooks spend them on the within-cluster
    offsets.  The first 16 vectors are one per cluster so both the
    kmeans seeds and the PQ seeds start well-spread."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(n_clusters, dim)) * 2.0
    # residual prototypes shared across clusters (codable structure)
    res_protos = rng.normal(size=(8, dim)) * scale
    vecs = []
    for i in range(n):
        c = i % n_clusters
        r = res_protos[rng.integers(8)] + rng.normal(scale=0.02, size=dim)
        vecs.append(centers[c] + r)
    return np.array(vecs)


def _emb_from(spark, vecs):
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [
                np.asarray(v, dtype=np.float32).tolist() for v in vecs
            ],
            "label": [0] * len(vecs),
        }
    )
    return spark.createDataFrame(pdf)


def test_residual_ivf_pq_recall_at_least_non_residual(spark):
    """On coarse-clustered data the residual encoding must reach AT
    LEAST the raw-vector trained IVF-PQ's recall (Jégou et al. 2011
    section V.A — the residual is where the code budget's resolution
    goes once the cells absorb the means)."""
    from dask_mwu_spark.operators.similarity import (
        ann_recall_eval,
        ivf_pq_residual_topk,
        ivf_pq_topk_trained,
    )

    emb = _emb_from(spark, _clustered_vectors(200))
    kw = dict(n_train=200, n_queries=10, k=5)
    residual = ann_recall_eval(
        emb,
        approx=ivf_pq_residual_topk(emb, **kw).select("q_id", "vec_id"),
    ).toPandas()
    raw = ann_recall_eval(
        emb,
        approx=ivf_pq_topk_trained(emb, **kw).select("q_id", "vec_id"),
    ).toPandas()
    assert residual.recall.mean() >= raw.recall.mean()
    assert residual.recall.mean() >= 0.5


def test_ivf_batch_topk_requires_centroids_with_injected_index(spark):
    """ADVICE r11: index= without centroids= must raise, never silently
    probe against a default-derived seed."""
    emb = _emb(spark)
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), "embedding"
    )
    idx = sim.ivf_index(emb, centroids=cents)
    queries = emb.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="centroids= is required"):
        sim.ivf_batch_topk(emb, queries, index=idx)
