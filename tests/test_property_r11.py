"""Property-based differential tests for the round-11 operators:
random corpora vs brute-force Python models (the test_property_r3
conventions — few examples, full-operator coverage per example,
hypothesis shrinking for minimal counterexamples)."""

import math
from collections import Counter

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary -> dense trigram/phrase collision structure
_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
        min_size=1,
        max_size=10,
    ),
    min_size=1,
    max_size=10,
)


def _docs_df(spark, corpus):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(corpus)),
                "text": [" ".join(words) for words in corpus],
            }
        )
    )


@given(corpus=_corpus)
@settings(**SETTINGS)
def test_phrase_search_matches_bruteforce(spark, corpus):
    """Every (phrase, doc) hit count and first position matches a pure
    Python sliding-window scan — overlaps included."""
    from dask_mwu_spark.operators.retrieval import phrase_search

    phrases = ["a bb", "bb a", "a a", "ccc", "dd e a"]
    got = {
        (r["phrase_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(_docs_df(spark, corpus), phrases).collect()
    }
    want = {}
    for pid, p in enumerate(phrases):
        pw = p.split(" ")
        for did, words in enumerate(corpus):
            hits = [
                i
                for i in range(len(words) - len(pw) + 1)
                if words[i : i + len(pw)] == pw
            ]
            if hits:
                want[(pid, did)] = (len(hits), hits[0])
    assert got == want


@given(corpus=_corpus, discount_pct=st.integers(min_value=10, max_value=90))
@settings(**SETTINGS)
def test_kn_score_matches_bruteforce(spark, corpus, discount_pct):
    """The interpolated-KN per-doc averages match an independent pure
    Python implementation for random discounts and corpora (docs with
    < 3 tokens keep NULL scores)."""
    from dask_mwu_spark.operators.text import kneser_ney_score

    # need at least one trigram in the corpus or B = 0 (documented
    # degenerate input)
    if not any(len(ws) >= 3 for ws in corpus):
        corpus = corpus + [["a", "bb", "a"]]
    d = discount_pct / 100.0
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logp"], r["ppl_proxy"])
        for r in kneser_ney_score(
            _docs_df(spark, corpus), discount=d
        ).collect()
    }

    c3 = Counter()
    vocab = set()
    for ws in corpus:
        vocab.update(ws)
        for i in range(len(ws) - 2):
            c3[tuple(ws[i : i + 3])] += 1
    c12, n12, cc = Counter(), Counter(), Counter()
    for (w1, w2, w3), c in c3.items():
        c12[(w1, w2)] += c
        n12[(w1, w2)] += 1
        cc[(w2, w3)] += 1
    cx1, n1, cu = Counter(), Counter(), Counter()
    for (w2, w3), c in cc.items():
        cx1[w2] += c
        n1[w2] += 1
        cu[w3] += 1
    B, W, V = float(len(cc)), float(len(cu)), float(len(vocab))

    def p1(w3):
        return max(cu.get(w3, 0) - d, 0.0) / B + (d * W / B) * (
            1.0 / (V + 1.0)
        )

    def p2(w2, w3):
        if w2 not in cx1:
            return p1(w3)
        return max(cc.get((w2, w3), 0) - d, 0.0) / cx1[w2] + (
            d * n1[w2] / cx1[w2]
        ) * p1(w3)

    def p3(w1, w2, w3):
        if (w1, w2) not in c12:
            return p2(w2, w3)
        return max(c3.get((w1, w2, w3), 0) - d, 0.0) / c12[(w1, w2)] + (
            d * n12[(w1, w2)] / c12[(w1, w2)]
        ) * p2(w2, w3)

    for did, ws in enumerate(corpus):
        lps = [
            math.log(p3(*ws[i : i + 3])) for i in range(len(ws) - 2)
        ]
        if not lps:
            assert got[did] == (0, None, None)
            continue
        total = 0.0
        for x in lps:
            total += x
        avg = total / len(lps)
        assert got[did] == (
            len(lps),
            round(avg, 6),
            round(math.exp(-avg), 6),
        ), did


@given(corpus=_corpus)
@settings(**SETTINGS)
def test_bm25_incremental_random_split_equals_rebuild(spark, corpus):
    """For a random corpus and an arbitrary even/odd split, serving
    from the incrementally updated index equals bm25_topk over the
    whole corpus — the recompute-equality contract under shrinking."""
    from dask_mwu_spark.operators.retrieval import (
        bm25_build_index,
        bm25_index_update,
        bm25_topk_from_index,
    )
    from dask_mwu_spark.operators.text import bm25_topk

    docs = _docs_df(spark, corpus)
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    idx = bm25_build_index(a)
    if b.take(1):
        idx = bm25_index_update(idx, b, check_disjoint=False)
    terms = ["a", "ccc", "e"]
    got = sorted(
        tuple(r)
        for r in bm25_topk_from_index(idx, terms, k=20).collect()
    )
    want = sorted(
        tuple(r) for r in bm25_topk(docs, terms, k=20).collect()
    )
    assert got == want
