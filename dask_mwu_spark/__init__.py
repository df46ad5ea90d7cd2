"""dask_mwu_spark — a PySpark-native analytics engine with the query
capabilities of the reference ``alexdaiii/dask-mwu`` library, re-expressed
as declarative DataFrame algebra, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis).

The reference computes, for a dense (n_obs x n_features) matrix and a group
label vector, the one-vs-rest Mann-Whitney U statistic with tie correction,
normal-approximation two-sided p-values with continuity correction,
Benjamini-Hochberg adjusted p-values, and log2-fold-changes of group means
(reference: dask_mwu/__init__.py:1-15).  Here the matrix is a long/tidy
DataFrame ``(obs_id, feature, value)`` joined to ``(obs_id, group)`` and every
operator is DataFrame algebra that Catalyst can optimize.

Public API mirrors the reference's seven functions (see SURVEY.md section 2)
with Spark-native signatures.
"""

from dask_mwu_spark.errors import (
    EmptyArrayError,
    InvalidChunkSizeError,
    InvalidDimensionError,
)
from dask_mwu_spark.operators.groups import distinct_groups, group_sizes
from dask_mwu_spark.operators.logfoldchange import compute_logfoldchange
from dask_mwu_spark.operators.mwu import (
    compute_in_group_ranksum,
    compute_tie_term,
    mann_whitney_u,
)
from dask_mwu_spark.operators.ranking import rank_data, rank_values
from dask_mwu_spark.operators.topk import create_df
from dask_mwu_spark.operators.validation import validate_obs_partition
from dask_mwu_spark.plans.pipeline import rank_features_by_group

__all__ = [
    "EmptyArrayError",
    "InvalidChunkSizeError",
    "InvalidDimensionError",
    "compute_in_group_ranksum",
    "compute_logfoldchange",
    "compute_tie_term",
    "create_df",
    "distinct_groups",
    "group_sizes",
    "mann_whitney_u",
    "rank_data",
    "rank_values",
    "rank_features_by_group",
    "validate_obs_partition",
]
