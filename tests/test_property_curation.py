"""Property-based invariant tests (hypothesis) for the curation operators:
random corpora vs pure-Python oracles of the packing / splitting /
funnel semantics.  Few examples (Spark jobs are slow per example), each
checking the full invariant set; shrinking still gives minimal
counterexamples."""

import hashlib

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_mwu_spark.operators.curation import hash_split, pack_sequences
from dask_mwu_spark.operators.events import funnel

_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "eee"]), min_size=1, max_size=12
    ),
    min_size=1,
    max_size=25,
)


def _docs(spark, token_lists):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(token_lists)),
                "text": [" ".join(t) for t in token_lists],
                "lang": ["en"] * len(token_lists),
                "source": ["s"] * len(token_lists),
                "n_chars": [len(" ".join(t)) for t in token_lists],
            }
        )
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpus)
def test_pack_sequences_invariants(spark, token_lists):
    max_tokens, n_shards = 8, 3
    got = (
        pack_sequences(_docs(spark, token_lists), max_tokens=max_tokens, n_shards=n_shards)
        .toPandas()
        .sort_values("doc_id")
    )
    # token counts match the inputs; every doc appears exactly once
    assert list(got.n_tokens) == [len(t) for t in token_lists]
    assert sorted(got.doc_id) == list(range(len(token_lists)))
    for shard, grp in got.groupby("shard"):
        grp = grp.sort_values("doc_id")
        # offsets are the exclusive prefix sum of token counts, in id order
        run = 0
        for _, row in grp.iterrows():
            assert row.shard == row.doc_id % n_shards
            assert row.start_offset == run
            assert row.pack == run // max_tokens
            run += row.n_tokens


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.integers(min_value=1, max_value=60), st.integers(min_value=0, max_value=9))
def test_hash_split_matches_python_md5_oracle(spark, n_docs, salt_i):
    """Engine assignment == pure-Python md5 bucketing, for any corpus size
    and salt (the determinism the split contract promises)."""
    salt = f"s{salt_i}"
    docs = _docs(spark, [["x"]] * n_docs)
    got = hash_split(docs, salt=salt).toPandas().set_index("doc_id").split
    for i in range(n_docs):
        h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        bucket = int(h[:15], 16) % 10_000
        want = "train" if bucket < 9000 else ("val" if bucket < 9500 else "test")
        assert got.loc[i] == want


_stream = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user
        st.sampled_from(["s1", "s2", "s3"]),
        st.integers(min_value=0, max_value=50),  # ts
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_stream)
def test_funnel_matches_python_oracle(spark, rows):
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    )
    steps = ["s1", "s2", "s3"]
    got = funnel(ev, steps).toPandas().set_index("step_name").n_users.to_dict()

    # oracle: per-user min-ts chaining in plain Python
    want = {s: 0 for s in steps}
    for u in {r[0] for r in rows}:
        mine = sorted((t, s) for (uu, s, t) in rows if uu == u)
        prev_t = None
        for i, step in enumerate(steps):
            cand = [t for (t, s) in mine if s == step and (prev_t is None or t >= prev_t)]
            if not cand:
                break
            prev_t = min(cand)
            want[step] += 1
    assert got == want
    # monotonicity: conversion can only shrink down the funnel
    assert got["s1"] >= got["s2"] >= got["s3"]
