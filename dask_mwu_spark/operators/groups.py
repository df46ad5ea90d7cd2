"""Group operators (reference M1/A2: dask_mwu/rank_data.py:41-87, pvals.py:111-112).

The reference materializes a one-hot (n_obs x n_groups) boolean mask matrix;
in relational form membership *is* the ``group`` column, so M1 reduces to a
sorted-distinct and A2 to a grouped count + complement.  Neither ever touches
an (obs x group) structure — the complement ``n2 = N - n1`` keeps one-vs-rest
O(1) passes regardless of group count (SURVEY.md section 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dask_mwu_spark.errors import InvalidDimensionError


def distinct_groups(obs: DataFrame, *, group_col: str = "group") -> DataFrame:
    """Sorted distinct group labels (reference ``get_masks`` sorts via
    np.unique — rank_data.py:79-87; output column order depends on it)."""
    if group_col not in obs.columns:
        raise InvalidDimensionError(f"missing column {group_col!r}")
    return obs.select(F.col(group_col).alias("group")).distinct().orderBy("group")


def group_sizes(obs: DataFrame, *, group_col: str = "group") -> DataFrame:
    """Per-group n1 and complement n2 = N - n1 (pvals.py:111-112).

    N is attached with an unpartitioned window over the *already aggregated*
    group-count table (n_groups rows), not the raw data — the single-partition
    window is on tiny data by construction.
    """
    if group_col not in obs.columns:
        raise InvalidDimensionError(f"missing column {group_col!r}")
    counts = obs.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n1")
    )
    w = Window.partitionBy()
    return counts.select(
        "group",
        "n1",
        (F.sum("n1").over(w) - F.col("n1")).alias("n2"),
    )
