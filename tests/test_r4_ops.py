"""Round-4 operator semantics: BM25 retrieval, source vocabulary overlap,
duplicated-span detection, token-balanced shards, weighted sampling, and
snapshot diff — hand-built inputs with hand-computed expectations."""

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from dask_mwu_spark.operators.curation import token_shards, weighted_sample
from dask_mwu_spark.operators.dedup import duplicated_spans, span_dedup_stats
from dask_mwu_spark.operators.text import bm25_topk, source_vocab_overlap
from dask_mwu_spark.sources.cdc import snapshot_diff, snapshot_diff_summary


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )


# ---------------------------------------------------------------------------
# duplicated spans
# ---------------------------------------------------------------------------


def test_duplicated_spans_cross_doc_run(spark):
    # docs 1 and 2 share the exact 5-token run "a b c d e"; doc 3 is unique
    docs = _docs(
        spark,
        [
            (1, "a b c d e x1 y1 z1", "en", "s", 1),
            (2, "p2 q2 a b c d e r2", "en", "s", 1),
            (3, "totally unique words here only", "en", "s", 1),
        ],
    )
    got = (
        duplicated_spans(docs, n=3)
        .toPandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    # shared 5-token run => 3-gram starts at 3 consecutive positions, one span
    assert list(got.doc_id) == [1, 2]
    d1 = got[got.doc_id == 1].iloc[0]
    assert (d1.span_start, d1.span_end, d1.n_grams, d1.span_tokens) == (0, 4, 3, 5)
    d2 = got[got.doc_id == 2].iloc[0]
    assert (d2.span_start, d2.span_end, d2.n_grams, d2.span_tokens) == (2, 6, 3, 5)


def test_duplicated_spans_overlap_merges_no_double_count(spark):
    # doc 1: two duplicated 3-gram starts at pos 0 and pos 2 (gap 2 <= n-1):
    # ranges [0,2] and [2,4] overlap -> ONE span [0,4], 5 tokens (not 6)
    docs = _docs(
        spark,
        [
            (1, "a b c z e f tail1 here1", "en", "s", 1),
            (2, "a b c other2 words2 two2", "en", "s", 1),
            (3, "c z e pad3 pad3b pad3c", "en", "s", 1),
            (4, "far gap a b c pad4 pad4b c z e", "en", "s", 1),
        ],
    )
    got = duplicated_spans(docs, n=3).toPandas()
    d1 = got[got.doc_id == 1]
    assert len(d1) == 1
    r = d1.iloc[0]
    assert (r.span_start, r.span_end, r.n_grams, r.span_tokens) == (0, 4, 2, 5)
    # doc 4 has the same two duplicated grams but 2 tokens apart past reach
    # (starts 2 and 7, gap 5 > n-1) -> two disjoint spans
    d4 = got[got.doc_id == 4].sort_values("span_start")
    assert len(d4) == 2
    assert list(d4.span_start) == [2, 7] and list(d4.span_end) == [4, 9]


def test_duplicated_spans_within_doc_repeat(spark):
    # a doc repeating its own 3-gram is self-duplicated (occ >= 2 corpus-wide)
    docs = _docs(
        spark,
        [
            (1, "x y z gap1 gap2 x y z", "en", "s", 1),
            (2, "none of these repeat at all", "en", "s", 1),
        ],
    )
    got = duplicated_spans(docs, n=3).toPandas().sort_values("span_start")
    assert list(got.doc_id.unique()) == [1]
    assert list(got.span_start) == [0, 5]


def test_span_dedup_stats_coverage(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e x1 y1 z1", "en", "s", 1),  # 5 of 8 tokens dup
            (2, "a b c d e", "en", "s", 1),  # fully duplicated
            (3, "unique3 only3 words3 here3", "en", "s", 1),
        ],
    )
    got = span_dedup_stats(docs, n=3).toPandas().set_index("doc_id")
    assert got.loc[1].dup_tokens == 5 and got.loc[1].n_tokens == 8
    assert got.loc[1].dup_frac == round(5 / 8, 6)
    assert got.loc[2].dup_frac == 1.0
    assert got.loc[3].n_spans == 0 and got.loc[3].dup_frac == 0.0


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_matches_hand_formula(spark):
    docs = _docs(
        spark,
        [
            (1, "apple banana apple cherry", "en", "s", 1),
            (2, "apple dog egg fig grape horse", "en", "s", 1),
            (3, "dog egg fig grape horse igloo", "en", "s", 1),
        ],
    )
    got = bm25_topk(docs, ["apple", "banana"], k=3).toPandas()
    # doc 3 has no query term -> absent
    assert sorted(got.doc_id) == [1, 2]
    n, avgdl = 3, (4 + 6 + 6) / 3

    def score(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    exp1 = round(score(2, 2, 4) + score(1, 1, 4), 6)  # apple tf2 + banana tf1
    exp2 = round(score(1, 2, 6), 6)
    got = got.set_index("doc_id")
    assert got.loc[1].score == pytest.approx(exp1, abs=1e-6)
    assert got.loc[2].score == pytest.approx(exp2, abs=1e-6)
    assert got.loc[1]["rank"] == 1 and got.loc[1].n_terms_hit == 2


def test_bm25_rank_is_score_ordered(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["term"] * (i + 1) + ["pad"] * 5), "en", "s", 1) for i in range(8)],
    )
    got = bm25_topk(docs, ["term"], k=5).toPandas().sort_values("rank")
    assert len(got) == 5
    assert list(got["rank"]) == [1, 2, 3, 4, 5]
    assert (got.score.diff().dropna() <= 1e-12).all()  # non-increasing


# ---------------------------------------------------------------------------
# source vocabulary overlap
# ---------------------------------------------------------------------------


def test_source_vocab_overlap_exact_jaccard(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c", "en", "s1", 1),
            (2, "b c d", "en", "s1", 1),  # s1 vocab {a,b,c,d}
            (3, "c d e f", "en", "s2", 1),  # s2 vocab {c,d,e,f}
            (4, "x y", "en", "s3", 1),  # s3 vocab {x,y} (disjoint)
        ],
    )
    got = (
        source_vocab_overlap(docs)
        .toPandas()
        .set_index(["src_a", "src_b"])
        .sort_index()
    )
    r = got.loc[("s1", "s2")]
    assert (r.n_common, r.n_a, r.n_b) == (2, 4, 4)
    assert r.jaccard == round(2 / 6, 6)
    # disjoint pairs produce no row (inner join) — by design
    assert ("s1", "s3") not in got.index and ("s2", "s3") not in got.index


# ---------------------------------------------------------------------------
# token shards
# ---------------------------------------------------------------------------


def test_token_shards_cumsum_matches_pandas(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * (1 + i % 17)), "en", "s", 1) for i in range(300)],
    )
    got = token_shards(docs, shard_tokens=100, n_buckets=8).toPandas()
    # recompute the global exclusive cumsum over the md5 order in pandas
    import hashlib

    def h(i):
        return int(hashlib.md5(f"shard-order:{i}".encode()).hexdigest()[:15], 16)

    got["_h"] = got.doc_id.map(h)
    got = got.sort_values(["_h", "doc_id"]).reset_index(drop=True)
    expect_start = got.n_tokens.cumsum().shift(fill_value=0)
    assert (got.global_start.values == expect_start.values).all()
    assert (got.shard.values == (got.global_start // 100).values).all()
    # total tokens preserved
    assert got.n_tokens.sum() == sum(1 + i % 17 for i in range(300))


def test_token_shards_invariant_to_bucket_count(spark):
    """The two-phase bucketed prefix sum must equal the single-bucket
    (one global window) answer for ANY n_buckets — the distributed
    decomposition is pure implementation."""
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * (1 + (i * 7) % 23)), "en", "s", 1) for i in range(257)],
    )
    a = (
        token_shards(docs, shard_tokens=64, n_buckets=1)
        .select("doc_id", "global_start", "shard")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        token_shards(docs, shard_tokens=64, n_buckets=64)
        .select("doc_id", "global_start", "shard")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


# ---------------------------------------------------------------------------
# weighted sample
# ---------------------------------------------------------------------------


def test_weighted_sample_basic_properties(spark):
    docs = _docs(
        spark, [(i, "x", "en", "s", 1 + i % 50) for i in range(500)]
    )
    got = weighted_sample(docs, k=20, weight_col="n_chars").toPandas()
    assert len(got) == 20
    assert got.doc_id.is_unique
    assert list(got["rank"]) == list(range(1, 21))
    # keys non-increasing in rank order
    s = got.sort_values("rank").key
    assert (s.diff().dropna() <= 1e-12).all()
    # deterministic across invocations
    again = weighted_sample(docs, k=20, weight_col="n_chars").toPandas()
    assert got.sort_values("rank").reset_index(drop=True).equals(
        again.sort_values("rank").reset_index(drop=True)
    )


def test_weighted_sample_dominant_weight_always_selected(spark):
    # one doc with overwhelming weight: key = ln(u)/w -> ~0, the maximum
    rows = [(i, "x", "en", "s", 1) for i in range(200)]
    rows.append((999, "x", "en", "s", 10**9))
    docs = _docs(spark, rows)
    got = weighted_sample(docs, k=5, weight_col="n_chars").toPandas()
    assert got[got["rank"] == 1].doc_id.iloc[0] == 999


def test_weighted_sample_excludes_nonpositive_weights(spark):
    rows = [(1, "x", "en", "s", 10), (2, "x", "en", "s", 0), (3, "x", "en", "s", -5)]
    docs = _docs(spark, rows)
    got = weighted_sample(docs, k=10, weight_col="n_chars").toPandas()
    assert sorted(got.doc_id) == [1]


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------


def _snap(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "a", "b"])
    )


def test_snapshot_diff_all_statuses(spark):
    old = _snap(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _snap(spark, [(1, "x", 10), (2, "y", 99), (4, "w", 40)])
    got = (
        snapshot_diff(old, new, keys=["k"])
        .toPandas()
        .set_index("k")
        .diff_status
    )
    assert got.loc[1] == "unchanged"
    assert got.loc[2] == "changed"
    assert got.loc[3] == "removed"
    assert got.loc[4] == "added"
    summary = (
        snapshot_diff_summary(old, new, keys=["k"])
        .toPandas()
        .set_index("diff_status")
        .n_rows
    )
    assert summary.to_dict() == {
        "unchanged": 1, "changed": 1, "removed": 1, "added": 1
    }


def test_snapshot_diff_respects_compare_cols(spark):
    old = _snap(spark, [(1, "x", 10)])
    new = _snap(spark, [(1, "x", 999)])
    got = snapshot_diff(old, new, keys=["k"], compare_cols=["a"]).toPandas()
    assert got.iloc[0].diff_status == "unchanged"


def test_snapshot_diff_null_vs_value(spark):
    old = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "a": ["x", None]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "a": [None, None]})
    )
    got = snapshot_diff(old, new, keys=["k"]).toPandas().set_index("k")
    assert got.loc[1].diff_status == "changed"  # value -> NULL is a change
    assert got.loc[2].diff_status == "unchanged"  # NULL == NULL


def test_snapshot_diff_digest_before_join_plan(spark):
    """The join must see only (key, digest) columns — wide payloads are
    digested upstream of the shuffle, so the optimized plan projects the
    md5 BEFORE the join and no raw payload column appears above it."""
    old = _snap(spark, [(1, "x", 10)])
    new = _snap(spark, [(1, "x", 10)])
    plan = (
        snapshot_diff(old, new, keys=["k"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    join_pos = plan.find("Join")
    assert join_pos != -1
    # everything above the join node references digests/keys only
    above = plan[:join_pos]
    assert "_h_old" in plan and "_h_new" in plan
    assert "a#" not in above and "b#" not in above


# ---------------------------------------------------------------------------
# n-gram novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_first_occurrence_order(spark):
    from dask_mwu_spark.operators.text import ngram_novelty

    docs = _docs(
        spark,
        [
            (1, "a b c d", "en", "s", 1),  # grams abc, bcd — both novel
            (2, "a b c x", "en", "s", 1),  # abc seen (doc 1), abx novel... grams: abc, bcx
            (3, "a b c d", "en", "s", 1),  # all grams first seen earlier
            (4, "xx yy", "en", "s", 1),  # too short: 0 grams
        ],
    )
    got = ngram_novelty(docs, n=3).toPandas().set_index("doc_id")
    assert (got.loc[1].n_grams, got.loc[1].n_novel) == (2, 2)
    assert got.loc[1].novelty_frac == 1.0
    assert (got.loc[2].n_grams, got.loc[2].n_novel) == (2, 1)  # abc old, bcx new
    assert got.loc[2].novelty_frac == 0.5
    assert (got.loc[3].n_grams, got.loc[3].n_novel) == (2, 0)
    assert got.loc[3].novelty_frac == 0.0
    assert (got.loc[4].n_grams, got.loc[4].novelty_frac) == (0, 0.0)


# ---------------------------------------------------------------------------
# mixture KL
# ---------------------------------------------------------------------------


def test_mixture_kl_hand_math(spark):
    from dask_mwu_spark.operators.curation import mixture_kl

    docs = _docs(
        spark,
        [
            (1, "w w w", "en", "a", 1),  # 3 tokens
            (2, "w", "en", "b", 1),  # 1 token
        ],
    )
    got = mixture_kl(docs, {"a": 1.0, "b": 1.0}).toPandas().set_index("source")
    assert got.loc["a"].n_tokens == 3
    assert got.loc["a"].actual_share == 0.75
    assert got.loc["a"].target_share == 0.5
    assert got.loc["a"].kl_term == round(0.75 * math.log(0.75 / 0.5), 6)
    assert got.loc["b"].kl_term == round(0.25 * math.log(0.25 / 0.5), 6)
    # KL(actual || target) >= 0 summed
    assert got.kl_term.sum() > 0


def test_mixture_kl_off_recipe_source_is_null(spark):
    from dask_mwu_spark.operators.curation import mixture_kl

    docs = _docs(
        spark, [(1, "w", "en", "a", 1), (2, "w", "en", "rogue", 1)]
    )
    got = mixture_kl(docs, {"a": 1.0}).toPandas().set_index("source")
    assert pd.isna(got.loc["rogue"].target_share)
    assert pd.isna(got.loc["rogue"].kl_term)
    assert got.loc["a"].target_share == 1.0


# ---------------------------------------------------------------------------
# per-source dup rate
# ---------------------------------------------------------------------------


def test_dedup_rate_by_source(spark):
    from dask_mwu_spark.operators.dedup import dedup_rate_by_source

    docs = _docs(
        spark,
        [
            (1, "same text", "en", "a", 1),
            (2, "Same   TEXT", "en", "a", 1),  # normalizes equal
            (3, "other", "en", "a", 1),
            (4, "unique", "en", "b", 1),
        ],
    )
    got = dedup_rate_by_source(docs).toPandas().set_index("source")
    assert (got.loc["a"].n_docs, got.loc["a"].n_uniq) == (3, 2)
    assert got.loc["a"].dup_frac == round(1 - 2 / 3, 6)
    assert got.loc["b"].dup_frac == 0.0


# ---------------------------------------------------------------------------
# windowed event dedup
# ---------------------------------------------------------------------------


def test_window_dedup_keeps_first_per_window(spark):
    from dask_mwu_spark.operators.events import window_dedup_events

    W = 300_000_000_000  # 5 min in ns
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, 10 * W + 5, 1, "click", 1.0),  # window 10, first
        (2, 10 * W + 9, 1, "click", 2.0),  # dup in same window -> dropped
        (3, 11 * W, 1, "click", 3.0),  # next window -> kept
        (4, 10 * W + 9, 1, "view", 4.0),  # different type -> kept
        (5, 10 * W + 5, 2, "click", 5.0),  # different user -> kept
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    )
    got = window_dedup_events(ev).toPandas()
    assert sorted(got.event_id) == [1, 3, 4, 5]
    assert set(got[got.event_id.isin([1, 4])].win) == {10}


def test_window_dedup_tie_breaks_by_event_id(spark):
    from dask_mwu_spark.operators.events import window_dedup_events

    rows = [(9, 1000, 1, "x", 0.0), (2, 1000, 1, "x", 0.0)]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    )
    got = window_dedup_events(ev, window_ns=10_000).toPandas()
    assert list(got.event_id) == [2]


def test_window_dedup_exact_at_nanosecond_magnitudes(spark):
    """Epoch-nanos exceed double's 53-bit mantissa: integer `div` must
    bucket exactly where float division would collapse adjacent windows."""
    from dask_mwu_spark.operators.events import window_dedup_events

    W = 300_000_000_000
    base = 1_700_000_000_000_000_000  # ~2023 in ns: > 2^60
    lo = (base // W) * W  # exact window start near `base`
    rows = [
        (1, lo - 1, 1, "x", 0.0),  # last ns of previous window
        (2, lo, 1, "x", 0.0),  # first ns of this window
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    )
    got = window_dedup_events(ev).toPandas()
    # both survive: they are in adjacent windows despite being 1 ns apart
    assert sorted(got.event_id) == [1, 2]
    assert got.win.nunique() == 2


# ---------------------------------------------------------------------------
# span trimming
# ---------------------------------------------------------------------------


def test_trim_duplicated_spans_removes_exact_runs(spark):
    from dask_mwu_spark.operators.dedup import trim_duplicated_spans

    docs = _docs(
        spark,
        [
            (1, "a b c d e x1 y1 z1", "en", "s", 1),  # [0,4] duplicated
            (2, "p2 q2 a b c d e r2", "en", "s", 1),  # [2,6] duplicated
            (3, "clean doc three stays whole", "en", "s", 1),
            (4, "a b c d e", "en", "s", 1),  # fully duplicated -> empty
        ],
    )
    got = trim_duplicated_spans(docs, n=3).toPandas().set_index("doc_id")
    assert got.loc[1].clean_text == "x1 y1 z1"
    assert got.loc[1].n_removed == 5 and got.loc[1].n_tokens == 8
    assert got.loc[2].clean_text == "p2 q2 r2"
    assert got.loc[3].clean_text == "clean doc three stays whole"
    assert got.loc[3].n_removed == 0
    assert got.loc[4].clean_text == "" and got.loc[4].n_removed == 5


def test_trim_preserves_token_order_across_spans(spark):
    from dask_mwu_spark.operators.dedup import trim_duplicated_spans

    # two disjoint duplicated spans inside one doc; remainder keeps order
    docs = _docs(
        spark,
        [
            (1, "k1 a b c k2 k3 x y z k4", "en", "s", 1),
            (2, "a b c only2 two2 here2", "en", "s", 1),
            (3, "x y z only3 three3 here3", "en", "s", 1),
        ],
    )
    got = trim_duplicated_spans(docs, n=3).toPandas().set_index("doc_id")
    assert got.loc[1].clean_text == "k1 k2 k3 k4"
    assert got.loc[1].n_removed == 6
