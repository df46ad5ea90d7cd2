"""Changelog-replay semantics on hand-built change streams."""

import pandas as pd
from pyspark.sql import functions as F

from dask_mwu_spark.sources.cdc import apply_changelog, merge_upsert


def _base(spark):
    return spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "v", "seq", "op"])
    )


def test_apply_changelog_latest_wins_and_deletes(spark):
    ch = _changes(
        spark,
        [
            (1, "a2", 1, "U"),  # update k=1
            (1, "a3", 5, "U"),  # later update wins
            (2, None, 3, "D"),  # delete k=2
            (4, "d1", 2, "U"),  # insert new key
            (4, None, 7, "D"),  # ... then delete it
            (5, "e1", 9, "U"),  # pure insert
        ],
    )
    got = (
        apply_changelog(_base(spark), ch, keys=["k"])
        .toPandas()
        .sort_values("k")
    )
    assert list(got.k) == [1, 3, 5]
    assert list(got.v) == ["a3", "c", "e1"]


def test_apply_changelog_delete_wins_seq_tie(spark):
    ch = _changes(spark, [(1, "x", 4, "U"), (1, None, 4, "D")])
    got = apply_changelog(_base(spark), ch, keys=["k"]).toPandas()
    assert sorted(got.k) == [2, 3]


def test_apply_changelog_resurrection_after_delete(spark):
    ch = _changes(spark, [(3, None, 1, "D"), (3, "c9", 2, "U")])
    got = apply_changelog(_base(spark), ch, keys=["k"]).toPandas().set_index("k")
    assert got.loc[3, "v"] == "c9"


def test_merge_upsert_updates_win_no_deletes(spark):
    upd = spark.createDataFrame(
        pd.DataFrame({"k": [2, 9], "v": ["b2", "i1"]})
    )
    got = merge_upsert(_base(spark), upd, keys=["k"]).toPandas().sort_values("k")
    assert list(got.k) == [1, 2, 3, 9]
    assert list(got.v) == ["a", "b2", "c", "i1"]


def test_apply_changelog_plan_has_single_shuffle_no_join(spark):
    """The merge must be union + one key shuffle + window — no join node
    (the scale contract in the module docstring)."""
    ch = _changes(spark, [(1, "a2", 1, "U")])
    df = apply_changelog(_base(spark), ch, keys=["k"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_scd2_history_intervals(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_mwu_spark.sources.cdc import scd2_history

    base = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    changes = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "v": ["a2", "a3", None],
                "seq": [1, 5, 3],
                "op": ["U", "U", "D"],
            }
        )
    )
    hist = {
        (r["k"], r["valid_from"]): r.asDict()
        for r in scd2_history(base, changes, keys=["k"]).collect()
    }
    # key 1: base(-1) -> u(1) -> u(5): two closed intervals + one open
    assert hist[(1, -1)]["valid_to"] == 1 and not hist[(1, -1)]["is_current"]
    assert hist[(1, 1)]["valid_to"] == 5 and not hist[(1, 1)]["is_current"]
    assert hist[(1, 5)]["valid_to"] is None and hist[(1, 5)]["is_current"]
    assert hist[(1, 5)]["v"] == "a3"
    # key 2: base closed by the delete at seq 3; no current row
    assert hist[(2, -1)]["valid_to"] == 3 and not hist[(2, -1)]["is_current"]
    assert (2, 3) not in hist  # the delete itself is not a version
    # key 3: untouched — single open interval
    assert hist[(3, -1)]["valid_to"] is None and hist[(3, -1)]["is_current"]
    assert len(hist) == 5
