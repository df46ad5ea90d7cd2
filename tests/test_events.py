"""Funnel / cohort semantics on hand-built event streams."""

import pandas as pd
import pytest

from dask_mwu_spark.operators.events import NS_PER_DAY, cohort_retention, funnel


def _events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    )


def test_funnel_requires_order(spark):
    d = NS_PER_DAY
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "signup", 1 * d),
            (1, "view", 2 * d),
            (1, "purchase", 3 * d),
            # user 2: purchase BEFORE signup -> stops at signup
            (2, "purchase", 1 * d),
            (2, "signup", 2 * d),
            # user 3: never signed up -> counted nowhere
            (3, "view", 1 * d),
        ],
    )
    got = (
        funnel(ev, ["signup", "view", "purchase"])
        .toPandas()
        .set_index("step_name")
    )
    assert got.loc["signup"].n_users == 2
    assert got.loc["view"].n_users == 1
    assert got.loc["purchase"].n_users == 1
    assert list(got.step) == [1, 2, 3]


def test_funnel_same_timestamp_counts(spark):
    # at-least-once semantics: a step at the same instant as the previous
    # step's min qualifies (>=, not >)
    ev = _events(spark, [(1, "a", 5), (1, "b", 5)])
    got = funnel(ev, ["a", "b"]).toPandas().set_index("step_name")
    assert got.loc["b"].n_users == 1
    with pytest.raises(ValueError):
        funnel(ev, [])


def test_cohort_retention_day_offsets(spark):
    d = NS_PER_DAY
    ev = _events(
        spark,
        [
            # user 1: first day 10, active days 10, 11, 13
            (1, "x", 10 * d + 5),
            (1, "x", 10 * d + 99),  # same day, deduped
            (1, "x", 11 * d + 1),
            (1, "x", 13 * d + 1),
            # user 2: first day 10, active day 10 only
            (2, "x", 10 * d + 7),
            # user 3: first day 11
            (3, "x", 11 * d),
        ],
    )
    got = (
        cohort_retention(ev)
        .toPandas()
        .set_index(["cohort_day", "day_offset"])
        .n_users.to_dict()
    )
    assert got == {
        (10, 0): 2,
        (10, 1): 1,
        (10, 3): 1,
        (11, 0): 1,
    }


def test_resample_fills_gaps_and_carries_forward(spark):
    from dask_mwu_spark.operators.events import resample_events

    h = 3_600_000_000_000  # NS_PER_HOUR
    ev = spark.createDataFrame(
        pd.DataFrame(
            [
                # user 1: events in hours 0, 0, 3 -> grid 0..3, gaps at 1,2
                (1, "a", 0 * h + 5, 10.0),
                (1, "b", 0 * h + 9, 2.5),
                (1, "c", 3 * h + 1, 7.0),
                # user 2: single event -> single-bucket grid
                (2, "a", 10 * h, 1.0),
            ],
            columns=["user_id", "event_type", "ts", "value"],
        )
    )
    got = (
        resample_events(ev)
        .toPandas()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    u1 = got[got.user_id == 1]
    assert list(u1.bucket) == [0, 1, 2, 3]
    assert list(u1.n_events) == [2, 0, 0, 1]
    assert u1.iloc[0].sum_value == 12.5
    assert pd.isna(u1.iloc[1].sum_value) and pd.isna(u1.iloc[2].sum_value)
    # forward fill carries 12.5 across the gap, then 7.0
    assert list(u1.filled_value) == [12.5, 12.5, 12.5, 7.0]
    u2 = got[got.user_id == 2]
    assert len(u2) == 1 and u2.iloc[0].n_events == 1


def test_resample_partition_invariance(spark):
    """Result must not depend on the input partition layout."""
    import numpy as np

    from dask_mwu_spark.operators.events import resample_events

    rng = np.random.default_rng(3)
    h = 3_600_000_000_000
    rows = [
        (int(u), "t", int(rng.integers(0, 50) * h + rng.integers(0, h)), float(v))
        for u, v in zip(rng.integers(0, 20, 400), rng.normal(size=400))
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "value"])
    )
    a = resample_events(ev.repartition(1)).toPandas()
    b = resample_events(ev.repartition(17)).toPandas()
    key = ["user_id", "bucket"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_user_event_sequences_order_and_truncation(spark):
    import pandas as pd
    from dask_mwu_spark.operators.events import user_event_sequences

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1] * 5 + [2],
                "event_id": [10, 11, 12, 13, 14, 20],
                "ts": [50, 40, 30, 20, 10, 99],  # reverse arrival order
                "event_type": ["e", "d", "c", "b", "a", "solo"],
            }
        )
    )
    out = {
        r["user_id"]: r.asDict()
        for r in user_event_sequences(ev, max_len=3).collect()
    }
    assert out[1]["n_events"] == 5  # count is pre-truncation
    assert out[1]["seq"] == "a>b>c"  # ts-ordered, clipped to max_len
    assert out[2] == {"user_id": 2, "n_events": 1, "seq": "solo"}


def test_user_event_sequences_tiebreak_on_event_id(spark):
    import pandas as pd
    from dask_mwu_spark.operators.events import user_event_sequences

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "event_id": [2, 1],
                "ts": [7, 7],  # same timestamp: event_id breaks the tie
                "event_type": ["second", "first"],
            }
        )
    )
    (row,) = user_event_sequences(ev).collect()
    assert row["seq"] == "first>second"


def test_path_ngrams_counts(spark):
    import pandas as pd
    from dask_mwu_spark.operators.events import path_ngrams

    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2, 2, 2],
                "event_id": [1, 2, 3, 4, 5, 6, 7],
                "ts": [10, 20, 30, 40, 10, 20, 30],
                "event_type": ["a", "b", "c", "d", "a", "b", "c"],
            }
        )
    )
    out = {r["path"]: r["n_occurrences"] for r in path_ngrams(ev, n=3).collect()}
    # user 1 contributes a>b>c and b>c>d; user 2 contributes a>b>c
    assert out == {"a>b>c": 2, "b>c>d": 1}
    # plan shape: the ordering must run over the AGGREGATED path table
    # (cardinality <= |event types|^n), never the raw event stream — AQE
    # picks TakeOrderedAndProject on file sources and a (tiny) global sort
    # on local relations; both are fine, sorting raw events is not
    df = path_ngrams(ev, n=3)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    sort_pos = min(
        (plan.find(m) for m in ("TakeOrderedAndProject", "Sort [n_occ")
         if plan.find(m) >= 0),
    )
    assert sort_pos >= 0 and "HashAggregate" in plan[sort_pos:]
