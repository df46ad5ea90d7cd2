"""Dedup operator semantics on hand-built corpora."""

import pandas as pd

from dask_mwu_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
    (1, "the quick brown fox jumps over the lazy dog", "en", "s", 43),  # exact dup
    (2, "The  Quick brown fox jumps over the lazy dog", "en", "s", 44),  # norm dup
    (3, "the quick brown fox jumps over the sleepy dog", "en", "s", 45),  # near dup
    (4, "completely different words about spark engines here", "en", "s", 51),
]


def _docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )


def test_exact_dedup_normalization(spark):
    groups = exact_dup_groups(_docs(spark)).toPandas()
    # docs 0,1,2 normalize to the same text -> one group of 3
    assert sorted(groups.n_docs) == [1, 1, 3]
    big = groups[groups.n_docs == 3].iloc[0]
    assert big.keep_doc_id == 0
    survivors = exact_dedup(_docs(spark)).toPandas()
    assert sorted(survivors.doc_id) == [0, 3, 4]


def test_ngram_jaccard_identifies_near_dup(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold=0.3, max_df=None).toPandas()
    idx = pairs.set_index(["doc_a", "doc_b"]).jaccard
    assert idx.loc[(0, 1)] == 1.0  # identical docs
    assert 0.3 <= idx.loc[(0, 3)] < 1.0  # near dup
    assert (4 not in pairs.doc_a.values) and (4 not in pairs.doc_b.values)


def test_minhash_signature_identical_docs_equal(spark):
    sig = minhash_signatures(_docs(spark)).toPandas()
    s0 = sig[sig.doc_id == 0].sort_values("i").minh.tolist()
    s1 = sig[sig.doc_id == 1].sort_values("i").minh.tolist()
    assert len(s0) == 16 and s0 == s1


def test_minhash_lsh_finds_exact_dup_pair(spark):
    pairs = minhash_lsh_pairs(_docs(spark), est_threshold=0.99).toPandas()
    assert {(0, 1)} <= set(zip(pairs.doc_a, pairs.doc_b))
    assert (pairs.set_index(["doc_a", "doc_b"]).est_jaccard.loc[(0, 1)]) == 1.0


def test_simhash_identical_docs_hamming_zero(spark):
    sh = simhash(_docs(spark)).toPandas().set_index("doc_id").simhash
    assert sh.loc[0] == sh.loc[1]
    assert 0 <= sh.loc[0] < 2**32
    pairs = simhash_pairs(_docs(spark), max_hamming=0).toPandas()
    assert (0, 1) in set(zip(pairs.doc_a, pairs.doc_b))


def test_dup_components_transitive_closure(spark):
    """a~b, b~c must collapse into one cluster labeled by the min doc_id."""
    from dask_mwu_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (20, 15)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component for r in dup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7, 15: 15, 20: 15}


def test_dup_components_long_chain_converges(spark):
    from dask_mwu_spark.operators.dedup import dup_components

    chain = [(i, i + 1) for i in range(30)]
    got = {r.doc_id: r.component for r in dup_components(pairs=spark.createDataFrame(chain, "doc_a long, doc_b long")).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_dup_components_fixed_rounds_matches_adaptive(spark):
    """n_rounds= (no convergence counts) must reach the same labels as the
    adaptive mode on a chain needing full propagation: hop+pointer-jump at
    least doubles distance per round, so ceil(log2(30))+1 = 6 rounds cover
    a 31-node chain (VERDICT r1 #7)."""
    from dask_mwu_spark.operators.dedup import dup_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    adaptive = {r.doc_id: r.component for r in dup_components(chain).collect()}
    fixed = {
        r.doc_id: r.component
        for r in dup_components(chain, n_rounds=6).collect()
    }
    assert fixed == adaptive
    assert set(fixed.values()) == {0}


def test_exact_dedup_full_digest_same_groups(spark):
    """128-bit production key groups identically to the 60-bit oracle key
    on any collision-free corpus (collision math: functions/hashing.py)."""
    g60 = exact_dup_groups(_docs(spark)).toPandas()
    g128 = exact_dup_groups(_docs(spark), full_digest=True).toPandas()
    assert sorted(g60.n_docs) == sorted(g128.n_docs)
    assert sorted(g60.keep_doc_id) == sorted(g128.keep_doc_id)
    assert g128.text_hash.str.len().eq(32).all()  # full hex digest
    s60 = exact_dedup(_docs(spark)).toPandas()
    s128 = exact_dedup(_docs(spark), full_digest=True).toPandas()
    assert sorted(s60.doc_id) == sorted(s128.doc_id)


def test_simhash_64bit_agrees_on_duplicate_pairs(spark):
    """VERDICT r1 #4: both widths must put identical texts at hamming 0;
    the 64-bit signature must actually use the high bits."""
    sh64 = simhash(_docs(spark), bits=64).toPandas().set_index("doc_id").simhash
    assert sh64.loc[0] == sh64.loc[1]
    p32 = simhash_pairs(_docs(spark), max_hamming=0).toPandas()
    p64 = simhash_pairs(_docs(spark), max_hamming=0, bits=64).toPandas()
    dup32 = set(zip(p32.doc_a, p32.doc_b))
    dup64 = set(zip(p64.doc_a, p64.doc_b))
    assert (0, 1) in dup32 and (0, 1) in dup64
    # hamming-0 under 64 bits is a strictly stronger condition
    assert dup64 <= dup32
    # 64-bit signatures spread beyond the low 32 bits (not just zero-padded)
    assert any((abs(int(v)) >> 32) != 0 for v in sh64.values)


def test_verify_jaccard_matches_exact_pairs(spark):
    """Verified two-stage pairs must agree with the exact all-pairs measure
    on every candidate LSH surfaces."""
    from dask_mwu_spark.operators.dedup import verified_pairs

    got = verified_pairs(
        _docs(spark), est_threshold=0.2, threshold=0.3
    ).toPandas()
    exact = (
        ngram_jaccard_pairs(_docs(spark), threshold=0.3, max_df=None)
        .toPandas()
        .set_index(["doc_a", "doc_b"])
        .jaccard
    )
    assert len(got) > 0
    for r in got.itertuples():
        assert exact.loc[(r.doc_a, r.doc_b)] == r.jaccard
    # identical docs verify at exactly 1.0
    idx = got.set_index(["doc_a", "doc_b"]).jaccard
    assert idx.loc[(0, 1)] == 1.0


def test_verify_jaccard_kills_false_positive(spark):
    """A fabricated candidate pair with zero shingle overlap must be
    filtered by the verification stage (jaccard 0 < threshold)."""
    from dask_mwu_spark.operators.dedup import verify_jaccard

    cand = spark.createDataFrame([(0, 4)], "doc_a long, doc_b long")
    out = verify_jaccard(_docs(spark), cand, threshold=0.1).toPandas()
    assert len(out) == 0


def test_edit_similarity_normalized_dup_is_one(spark):
    from dask_mwu_spark.operators.dedup import edit_similarity_pairs

    got = edit_similarity_pairs(
        _docs(spark), est_threshold=0.2, threshold=0.5
    ).toPandas()
    idx = got.set_index(["doc_a", "doc_b"]).edit_sim
    assert idx.loc[(0, 1)] == 1.0  # identical
    assert idx.loc[(0, 2)] == 1.0  # whitespace/case normalize to equal
    # near dup: one word differs ("lazy" -> "sleepy"): lev <= 6 on ~43 chars
    assert 0.8 <= idx.loc[(0, 3)] < 1.0


def test_edit_similarity_distance_cap_agrees(spark):
    """The banded JVM fast path must agree with the uncapped oracle path
    on every pair it emits."""
    from dask_mwu_spark.operators.dedup import edit_similarity_pairs

    full = edit_similarity_pairs(
        _docs(spark), est_threshold=0.2, threshold=0.5
    ).toPandas()
    capped = edit_similarity_pairs(
        _docs(spark), est_threshold=0.2, threshold=0.5, distance_cap=50
    ).toPandas()
    f = full.set_index(["doc_a", "doc_b"]).edit_sim.to_dict()
    c = capped.set_index(["doc_a", "doc_b"]).edit_sim.to_dict()
    assert f == c


def test_incremental_dedup_flags(spark):
    from dask_mwu_spark.operators.dedup import (
        band_index_update,
        incremental_dedup_flags,
        minhash_band_keys,
    )

    docs = _docs(spark)
    history = docs.where("doc_id = 0")  # corpus already contains doc 0
    batch = docs.where("doc_id > 0")
    hist_bands = minhash_band_keys(history)
    flags = {
        r["doc_id"]: r.asDict()
        for r in incremental_dedup_flags(batch, hist_bands).collect()
    }
    assert set(flags) == {1, 2, 3, 4}  # one row per batch doc
    # 1 and 2 are (normalized-)identical to history doc 0
    assert flags[1]["dup_of_history"] and not flags[1]["keep"]
    assert flags[2]["dup_of_history"] and not flags[2]["keep"]
    # 3 is a near dup: collides with history AND with smaller batch ids
    assert not flags[3]["keep"]
    # 4 shares nothing
    assert flags[4] == {
        "doc_id": 4,
        "dup_of_history": False,
        "dup_in_batch": False,
        "keep": True,
    }

    # index update: history bands + bands of kept docs only (doc 4)
    updated = band_index_update(batch, hist_bands)
    ids = {r["doc_id"] for r in updated.select("doc_id").distinct().collect()}
    assert ids == {0, 4}


def test_incremental_dedup_empty_history_and_short_docs(spark):
    import pandas as pd

    from dask_mwu_spark.operators.dedup import (
        incremental_dedup_flags,
        minhash_band_keys,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(10, "too short"), (11, "also tiny")], columns=["doc_id", "text"]
        )
    )
    empty_hist = minhash_band_keys(docs.where("doc_id < 0"))
    flags = incremental_dedup_flags(docs, empty_hist).collect()
    # docs with < n words have no shingles/bands: always kept
    assert all(r["keep"] and not r["dup_of_history"] for r in flags)
    assert len(flags) == 2
