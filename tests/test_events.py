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
