"""Validation operators (reference V1/V2: dask_mwu/_utils.py:25-51,
create_df.py:11-64).

The reference validates shapes eagerly; the relational equivalents are schema
assertions (free) plus one data-dependent invariant worth an actual query:
the labels must form a partition of the observations — every obs_id appears
exactly once and has a non-null group (_utils.py:47-51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_mwu_spark.errors import EmptyArrayError, NotPartitionError


def validate_obs_partition(
    obs: DataFrame, *, obs_col: str = "obs_id", group_col: str = "group"
) -> None:
    """Raise NotPartitionError unless labels partition the observations.

    Single aggregation pass; the ``count_if`` style predicates aggregate
    map-side so this is one small shuffle even at full scale.
    """
    stats = obs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(obs_col)).alias("n_distinct"),
        F.sum(F.col(group_col).isNull().cast("long")).alias("n_null"),
    ).first()
    if stats["n"] == 0:
        raise EmptyArrayError("observation table is empty")
    if stats["n_null"] > 0:
        raise NotPartitionError(
            f"{stats['n_null']} observations have no group label"
        )
    if stats["n_distinct"] != stats["n"]:
        raise NotPartitionError(
            f"duplicate obs_id: {stats['n']} rows but {stats['n_distinct']} distinct"
        )
