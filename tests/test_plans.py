"""Physical-plan scale guards for the round-2 operators: lock in the plan
shapes the 100 TB story depends on, so a refactor that silently
re-introduces a global sort / an unneeded shuffle / a shuffled dictionary
join fails CI, not the cluster."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.operators.curation import contamination, sample_mixture
from dask_mwu_spark.operators.text import (
    build_vocab,
    chunk_documents,
    ngram_topk,
    redact_pii,
    tokenize_ids,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(20),
                "text": [f"the fast row w{i} w{i % 3} runs" for i in range(20)],
                "lang": ["en"] * 20,
                "source": ["s"] * 20,
                "n_chars": [30] * 20,
            }
        )
    )


def test_ngram_topk_plan_is_take_ordered(docs):
    plan = _plan(ngram_topk(docs, n=2, k=3))
    assert "TakeOrderedAndProject" in plan, plan


def test_build_vocab_plan_is_take_ordered(docs):
    """The head selection must be TakeOrderedAndProject; the id-assigning
    global window is allowed only AFTER the limit (bounded input)."""
    plan = _plan(build_vocab(docs, max_size=5))
    assert "TakeOrderedAndProject" in plan, plan


def test_tokenize_ids_plan_broadcasts_vocab(docs):
    """The dictionary join must be a broadcast hash join — shuffling the
    token stream on the Zipf-skewed word key is the classic dictionary-
    encode mistake."""
    vocab = build_vocab(docs, max_size=5)
    plan = _plan(tokenize_ids(docs, vocab))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_contamination_plan_broadcasts_eval_side(docs):
    ev = docs.where(F.col("doc_id") < 2)
    plan = _plan(contamination(docs, ev))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_scan_stage_operators_have_no_exchange(docs):
    """redact_pii, chunk_documents, sample_mixture are pure scan-stage
    work — any Exchange in their plans is a regression."""
    for df in (
        redact_pii(docs),
        chunk_documents(docs, chunk_tokens=4, overlap=1),
        sample_mixture(docs, {"s": 0.5}),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan, plan


def test_top_orders_plan_take_ordered_and_broadcast(spark, sf_dir):
    """TPC-H Q3 shape: global top-10 must be TakeOrderedAndProject and the
    segment-filtered customer side must broadcast."""
    import __spark_entry__ as entry

    df = entry.queries()["orders_top_revenue"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_all_registered_queries_free_of_scale_antipatterns(spark, sf_dir):
    """Sweep EVERY queries() entry and reject the plan shapes that kill a
    100 TB run: cartesian products, broadcast nested-loop joins, and
    unpartitioned global window sorts.  A new query can only ship with one
    of these by adding itself to the explicit waiver dict below."""
    import __spark_entry__ as entrymod

    import re

    # windows that are provably bounded (post-limit heads etc.) may waive
    # the global-sort check; nothing currently waives joins
    waivers: dict[str, set[str]] = {
        # build_vocab ranks ONLY the post-limit head (<= max_size rows)
        "text_vocab_ids": {"global_window"},
        "text_tokenize_ids": {"global_window"},
        # round 9: the subword-id row_number runs over the SUBWORD
        # vocabulary, bounded by |alphabet| + n_merges symbols (a BPE
        # invariant: n merges mint at most n new symbols) — the
        # build_vocab bounded-head precedent
        "text_bpe_encode": {"global_window"},
        # vocab_topk/ngram_topk select via TakeOrderedAndProject (plan-
        # asserted elsewhere) and then rank the <= k-row head — bounded
        "text_vocab_topk": {"global_window"},
        "text_ngram_topk": {"global_window"},
        # brute-force ANN baselines: all-pairs BY DESIGN against a bounded
        # broadcast query set (condition = self-pair exclusion only); the
        # corpus-scale paths are sim_lsh_* / sim_ivf_* / sim_semantic_*
        "sim_cosine_topk": {"nested_loop"},
        "sim_quantized_topk": {"nested_loop"},
        # ann_recall_eval's ground-truth side IS the brute-force baseline
        # (that is the point of the harness); the approx side is bucketed
        "sim_ann_recall": {"nested_loop"},
        # round 5: pq_recall's TRUTH side is the brute-force baseline
        # (sim_ann_recall precedent); the PQ side is a bounded LUT join
        "sim_pq_recall": {"nested_loop"},
        # round 6: same harness, trained codebooks — the flagged BNLJ is
        # the identical brute-force TRUTH arm (the trained ADC side is
        # all BroadcastHashJoins on (s, code), verified by plan read)
        "sim_pq_trained_recall": {"nested_loop"},
        # round 6: trained-IVF recall — same brute TRUTH arm; the approx
        # side is the IVF cell join (cent_id key)
        "sim_ivf_trained_recall": {"nested_loop"},
        # round 5: the Matryoshka harness is N brute-force arms by design
        # (full-dim truth + one prefix-sliced scan per prefix, all against
        # the bounded broadcast query set — sim_ann_recall precedent)
        "sim_matryoshka_recall": {"nested_loop"},
        # threshold filter folded into the 1-ROW totals broadcast cross
        # (n_candidates x 1 'pairs' — a per-row filter in disguise)
        "text_heavy_hitters": {"nested_loop"},
        # round-4 bounded windows:
        # bm25/weighted_sample rank ONLY the post-limit head (<= k rows,
        # selected via TakeOrderedAndProject — plan-asserted in
        # test_r4_ops/test_plans)
        "text_bm25_topk": {"global_window"},
        # round 11: serve-from-index ends in the IDENTICAL post-limit
        # <= k-row rank head as text_bm25_topk (TakeOrderedAndProject
        # selects it; the serve==direct pytest pins output equality)
        "text_bm25_incremental": {"global_window"},
        # round 12: delete-then-serve ends in the same post-limit
        # <= k-row rank head (TakeOrderedAndProject selects it; the
        # delete==rebuild pytest pins output equality)
        "text_bm25_delete": {"global_window"},
        "cur_weighted_sample": {"global_window"},
        # round 5: dsir_resample ranks ONLY the post-limit <= k-row head
        # (TakeOrderedAndProject selects it — weighted_sample precedent)
        "cur_dsir_resample": {"global_window"},
        # token_shards' unpartitioned window is the exclusive bucket-prefix
        # sum over the <= n_buckets-row TOTALS table (the corpus-side
        # cumsum window is partitioned by _bucket; equivalence to the
        # single-window form is pytest-locked)
        "cur_token_shards": {"global_window"},
        # round-4b bounded shapes (same precedents as above):
        # zipf_fit ranks ONLY the post-limit <= top_v-row head
        # (TakeOrderedAndProject selects it, like bm25/vocab_topk)
        "text_zipf_fit": {"global_window"},
        # SNM's unpartitioned window is the bucket-offset prefix sum over
        # the <= |prefix alphabet|^2-row bucket-COUNT table; the corpus
        # rank window is partitioned by _bkt (token_shards precedent)
        "dedup_sorted_neighborhood": {"global_window"},
        # rolling DAU's conditioned BNLJ crosses against the 1-ROW
        # min/max-day aggregate — a per-row range clip in disguise
        # (text_heavy_hitters precedent); stickiness composes two of them
        "events_rolling_dau": {"nested_loop"},
        "events_stickiness": {"nested_loop"},
        # round 5: label-aware brute baselines — all-pairs BY DESIGN
        # against the bounded broadcast query set (sim_cosine_topk
        # precedent); the corpus-scale composition routes candidates
        # through sim_ivf_* / sim_lsh_* first
        "sim_hard_negatives": {"nested_loop"},
        "sim_knn_label_consistency": {"nested_loop"},
        # round 5: ABTT contrast scores the bounded broadcast query set
        # twice (before/after projection) — same brute-baseline waiver;
        # corpus-scale candidates route through IVF/LSH identically pre-
        # and post-projection
        "sim_abtt_contrast": {"nested_loop"},
        # round 5: the curve's truth arms are the recall-harness brute
        # baseline (sim_ann_recall precedent), one per n_probe setting
        "sim_ivf_recall_curve": {"nested_loop"},
        # round 5: MoM lag orders the POST-AGGREGATE months table —
        # bounded (~1200 rows for a century), the <=n_buckets precedent
        "orders_monthly_growth": {"global_window"},
        # round 5: power_users' cumsum window runs over the <=k-row
        # post-limit head (TakeOrderedAndProject selects it — the
        # bm25/vocab_topk precedent)
        "events_power_users": {"global_window"},
        # round 5: the balance-threshold filter folds into the 1-ROW
        # avg-balance broadcast cross (|dormant customers| x 1 — a
        # per-row filter in disguise; text_heavy_hitters precedent).
        # The anti-join itself is a proper hash join on custkey.
        "customer_dormant_balance": {"nested_loop"},
        # round 5: the concentration threshold folds into the 1-ROW
        # (total, n) broadcast cross (|suppliers| x 1 — a per-row filter
        # in disguise; customer_dormant_balance precedent).  The
        # supplier-name join is a proper hash join on suppkey.
        "supplier_value_share": {"nested_loop"},
        # round 5: Q15's argmax equality folds into the 1-ROW MAX
        # broadcast cross (same per-row-filter-in-disguise pattern)
        "supplier_top_revenue": {"nested_loop"},
        # (round-10 text_unigram_segments nested_loop waiver RETIRED in
        # the r12 optimization round: the Viterbi fold is materialized
        # before the posexplode, so the size(pieces) > 0 filter no
        # longer folds into the 1-row model cross — the plan is clean.)
        # round 10: both RRF rank windows run over POST-LIMIT heads
        # (TakeOrderedAndProject selects <= depth / <= k rows first —
        # the bm25/vocab_topk precedent; plan-asserted in
        # test_retrieval via the fused-output shape)
        "text_hybrid_rrf": {"global_window"},
        # round 10 (nested_loop half retired r12 with the segments
        # waiver above): the encode ranks piece ids over the
        # max_pieces+alphabet-bounded piece inventory (the
        # text_bpe_encode bounded-head precedent)
        "text_unigram_encode": {"global_window"},
    }
    bad: list[str] = []
    for name, fn in entrymod.queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        waived = waivers.get(name, set())
        if "CartesianProduct" in plan:
            bad.append(f"{name}: CartesianProduct")
        # BroadcastNestedLoopJoin as a plain Cross build is the idiomatic
        # scalar/tiny-aggregate broadcast (totals, coeff tables, 1-row
        # thresholds) — harmless.  A CONDITIONED BNLJ is an O(n*m)
        # inequality join evaluated row-at-a-time: that one kills runs.
        # a condition-less BNLJ ('... BuildRight, Inner' / ', Cross' with
        # nothing after the join type) is a pure cross against a broadcast
        # side — including equi-joins on a constant key that Catalyst
        # constant-folds away.  A trailing condition expression means the
        # engine is evaluating a predicate per row-pair: the O(n*m) killer.
        for bnlj in re.findall(r"BroadcastNestedLoopJoin [^\n]*", plan):
            parts = [p.strip() for p in bnlj.split(",")]
            conditioned = len(parts) > 2 and parts[2] != ""
            if conditioned and "nested_loop" not in waived:
                bad.append(f"{name}: conditioned BroadcastNestedLoopJoin ({bnlj[:80]})")
                break
        # a Window whose spec has an ORDER BY but an empty PARTITION BY
        # funnels the whole input through one task
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            head = spec.split("specifiedwindowframe")[0]
            if " ASC" in head or " DESC" in head:
                cols_before_order = head.split(",")[0].strip()
                if (
                    cols_before_order.endswith(("ASC NULLS FIRST", "DESC NULLS LAST"))
                    and "global_window" not in waived
                ):
                    bad.append(f"{name}: unpartitioned ordered window ({head[:60]})")
                    break
    assert not bad, "\n".join(sorted(set(bad)))
