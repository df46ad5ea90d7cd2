"""Property-based differential tests for the round-3 algorithmic
operators: random corpora/changelogs vs brute-force Python models.
Few examples (Spark jobs are slow per example) but each exercises the
full operator; hypothesis shrinking still yields minimal counterexamples.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random word streams over a tiny vocabulary -> dense tie/dup structure
_corpus = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=12,
)


@given(corpus=_corpus, theta_pct=st.integers(min_value=5, max_value=60))
@settings(**SETTINGS)
def test_heavy_hitters_matches_bruteforce(spark, corpus, theta_pct):
    from dask_mwu_spark.operators.text import heavy_hitters

    theta = theta_pct / 100.0
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(corpus)),
                "text": [" ".join(words) for words in corpus],
            }
        )
    )
    got = {
        (r["word"], r["n_occurrences"])
        for r in heavy_hitters(docs, theta=theta).collect()
    }
    flat = [w for words in corpus for w in words]
    n = len(flat)
    counts: dict[str, int] = {}
    for w in flat:
        counts[w] = counts.get(w, 0) + 1
    want = {(w, c) for w, c in counts.items() if c >= theta * n}
    assert got == want


@given(
    corpus=_corpus,
    split=st.lists(st.booleans(), min_size=1, max_size=12),
)
@settings(**SETTINGS)
def test_incremental_dedup_matches_bruteforce(spark, corpus, split):
    """Flags must equal the brute-force model: a batch doc is
    dup_of_history iff it shares a band key with any history doc, and
    dup_in_batch iff a smaller-id batch doc shares one."""
    from dask_mwu_spark.operators.dedup import (
        incremental_dedup_flags,
        minhash_band_keys,
    )

    docs = pd.DataFrame(
        {
            "doc_id": range(len(corpus)),
            "text": [" ".join(words) for words in corpus],
        }
    )
    is_hist = [
        split[i % len(split)] for i in range(len(corpus))
    ]
    sdf = spark.createDataFrame(docs)
    hist = sdf.where(
        F.col("doc_id").isin([i for i, h in enumerate(is_hist) if h])
    )
    batch = sdf.where(
        F.col("doc_id").isin([i for i, h in enumerate(is_hist) if not h])
    )
    if batch.count() == 0:
        return
    got = {
        r["doc_id"]: (r["dup_of_history"], r["dup_in_batch"])
        for r in incremental_dedup_flags(batch, minhash_band_keys(hist)).collect()
    }
    # brute-force band model from the operator's own banding (trusted
    # separately via the minhash oracle): doc -> set of (band, band_key)
    all_bands: dict[int, set] = {}
    for r in minhash_band_keys(sdf).collect():
        all_bands.setdefault(r["doc_id"], set()).add((r["band"], r["band_key"]))
    hist_keys = set()
    for i, h in enumerate(is_hist):
        if h:
            hist_keys |= all_bands.get(i, set())
    batch_ids = [i for i, h in enumerate(is_hist) if not h]
    assert set(got) == set(batch_ids)
    for i in batch_ids:
        bands = all_bands.get(i, set())
        want_hist = bool(bands & hist_keys)
        want_batch = any(
            bands & all_bands.get(j, set()) for j in batch_ids if j < i
        )
        assert got[i] == (want_hist, want_batch), i


_changelog = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # key
        st.sampled_from(["U", "D"]),                     # op
        st.integers(min_value=0, max_value=20),          # seq
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: (t[0], t[2]),  # unique seq per key, like a real log
)


@given(changes=_changelog)
@settings(**SETTINGS)
def test_scd2_matches_simulation(spark, changes):
    from dask_mwu_spark.sources.cdc import scd2_history

    base = spark.createDataFrame(
        pd.DataFrame({"k": [0, 1, 2, 3], "v": ["b0", "b1", "b2", "b3"]})
    )
    ch = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [k for k, _, _ in changes],
                "v": [f"v{s}" for _, _, s in changes],
                "seq": [s for _, _, s in changes],
                "op": [o for _, o, _ in changes],
            }
        ),
        "k long, v string, seq long, op string",
    )
    hist = scd2_history(base, ch, keys=["k"]).collect()
    # simulate: per key, versions ordered by (seq, D-after-U); upserts only
    # in output; valid_to = next version's seq; is_current = open & latest
    by_key: dict[int, list] = {k: [(-1, "U", f"b{k}")] for k in range(4)}
    for k, o, s in changes:
        by_key[k].append((s, o, f"v{s}"))
    expected = []
    for k, versions in by_key.items():
        versions.sort(key=lambda t: (t[0], {"U": 0, "D": 1}[t[1]]))
        for i, (s, o, v) in enumerate(versions):
            if o != "U":
                continue
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            expected.append((k, v, s, nxt, nxt is None))
    got = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist
    )
    assert got == sorted(expected)
