"""Round-10 regression tests.

Covers the VERDICT r9 items: the bounded-collect contract on the local
BPE path and the encode broadcast (#2), the trained-tokenizer reuse seam
(#3), and the ADVICE r9 bench/probe-runner fixes.
"""

from __future__ import annotations

import os
import sys
import warnings

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.operators import text as tx


def _toy_docs(spark):
    return spark.createDataFrame(
        [(0, "low low low low low"), (1, "lower lower"), (2, "newest widest")],
        "doc_id long, text string",
    )


# ---------------------------------------------------------------------------
# bounded-collect contract (VERDICT r9 item 2 / ADVICE r9)
# ---------------------------------------------------------------------------


def test_bpe_auto_local_uncapped_raises(spark):
    """engine='auto' past the threshold + max_vocab=None is the silent
    driver-OOM footgun: the caller never opted into a collect, so it is
    a hard error naming the fix."""
    docs = _toy_docs(spark)
    n = tx.BPE_LOCAL_ROUNDS + 1
    with pytest.raises(ValueError, match="max_vocab"):
        tx.bpe_train_merges(docs, n_merges=n, engine="auto")
    with pytest.raises(ValueError, match="max_vocab"):
        tx.bpe_segment_words(docs, n_merges=n, engine="auto")
    # capped auto is the sanctioned form and trains fine (pair
    # exhaustion stops the toy corpus long before 257 rounds)
    m = tx.bpe_train_merges(docs, n_merges=n, max_vocab=10_000).collect()
    assert 0 < len(m) < n


def test_bpe_explicit_local_uncapped_warns(spark):
    """Explicit engine='local' stays usable (tests/probes run it on toy
    corpora) but the unbounded collect is loud, never silent."""
    docs = _toy_docs(spark)
    with pytest.warns(UserWarning, match="max_vocab"):
        tx.bpe_train_merges(docs, n_merges=2, engine="local")
    # capped local is warning-free
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tx.bpe_train_merges(docs, n_merges=2, max_vocab=10_000, engine="local")


def test_bpe_encode_uncapped_broadcast_warns(spark):
    """The encode dictionary broadcast shares the same contract: uncapped
    warns (any engine — the broadcast exists in both), capped is silent
    and bit-identical on a bounded-vocab corpus."""
    docs = _toy_docs(spark)
    with pytest.warns(UserWarning, match="broadcast"):
        uncapped = sorted(
            tuple(r) for r in tx.bpe_encode_ids(docs, n_merges=4).collect()
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        capped = sorted(
            tuple(r)
            for r in tx.bpe_encode_ids(
                docs, n_merges=4, max_vocab=1_000_000
            ).collect()
        )
    assert uncapped == capped


# ---------------------------------------------------------------------------
# trained-tokenizer reuse seam (VERDICT r9 item 3)
# ---------------------------------------------------------------------------


def test_bpe_segment_words_injected_merges_identical(spark, sf_dir):
    """merges= injection is row-identical to retraining on the real
    corpus — the centroids= equivalence bar, at a merge count past the
    unit-test regime."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = 12
    learned = tx.bpe_train_merges(docs, n_merges=n)
    retrain = sorted(
        tuple(r) for r in tx.bpe_segment_words(docs, n_merges=n).collect()
    )
    injected = sorted(
        tuple(r) for r in tx.bpe_segment_words(docs, merges=learned).collect()
    )
    assert retrain == injected


def test_bpe_encode_injected_vocab_and_merges_identical(spark):
    """Both encode seams (vocab= from bpe_trained_vocab, merges= from
    bpe_train_merges) reproduce the retrain stream exactly, including
    the train-on-full/encode-a-slice composition."""
    docs = _toy_docs(spark)
    cap = 10_000
    sl = docs.where(F.col("doc_id") % 2 == 0)
    retrain = sorted(
        tuple(r)
        for r in tx.bpe_encode_ids(
            docs, n_merges=4, max_vocab=cap, encode_docs=sl
        ).collect()
    )
    trained = tx.bpe_trained_vocab(docs, n_merges=4, max_vocab=cap)
    learned = tx.bpe_train_merges(docs, n_merges=4, max_vocab=cap)
    with warnings.catch_warnings():
        # injected vocab= is exempt from the broadcast warning by design
        warnings.simplefilter("error")
        via_vocab = sorted(
            tuple(r)
            for r in tx.bpe_encode_ids(
                docs, vocab=trained, encode_docs=sl
            ).collect()
        )
    via_merges = sorted(
        tuple(r)
        for r in tx.bpe_encode_ids(
            docs, merges=learned, max_vocab=cap, encode_docs=sl
        ).collect()
    )
    assert retrain == via_vocab
    assert retrain == via_merges


def test_bpe_injected_merges_segment_new_words(spark):
    """Old merges applied to a NEW corpus's vocabulary: the fold is the
    trainer's greedy left-to-right pass, so 'aaa' under merge (a,a)
    segments as [aa, a, </w>] — never re-merging the fresh symbol."""
    # "aaa" trains pair counts (a,a)=2 > (a,</w>)=1, so round 0 learns
    # (a,a) outright (no tiebreak — (a,</w>) would win one on rhs asc)
    train = spark.createDataFrame([(0, "aaa b")], "doc_id long, text string")
    new = spark.createDataFrame([(0, "aaa ab")], "doc_id long, text string")
    learned = tx.bpe_train_merges(train, n_merges=1, max_vocab=100)
    assert [(r["lhs"], r["rhs"]) for r in learned.collect()] == [("a", "a")]
    rows = tx.bpe_segment_words(new, merges=learned).collect()
    by_word = {}
    for r in rows:
        by_word.setdefault(r["word"], []).append((r["pos"], r["subword"]))
    assert sorted(by_word["aaa"]) == [(0, "aa"), (1, "a"), (2, tx.BPE_EOW)]
    assert sorted(by_word["ab"]) == [(0, "a"), (1, "b"), (2, tx.BPE_EOW)]


def test_bpe_injection_validates_schemas(spark):
    docs = _toy_docs(spark)
    bad = spark.createDataFrame([(0, "a")], "merge_rank long, lhs string")
    with pytest.raises(ValueError, match="rhs"):
        tx.bpe_segment_words(docs, merges=bad)
    badv = spark.createDataFrame([("a", 1)], "word string, freq long")
    with pytest.raises(ValueError, match="syms"):
        tx.bpe_encode_ids(docs, vocab=badv)
