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
