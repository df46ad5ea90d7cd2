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

from dask_mwu_spark.cache import release_caches, tracked_count
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
from dask_mwu_spark.operators.skew import salted_join, two_phase_agg
from dask_mwu_spark.operators.topk import create_df, write_per_group_csv
from dask_mwu_spark.operators.validation import validate_obs_partition
from dask_mwu_spark.plans.pipeline import feature_group_stats, rank_features_by_group
from dask_mwu_spark.sources.bucketed import write_bucketed_table
from dask_mwu_spark.sources.loaders import load_table, melt

__all__ = [
    "EmptyArrayError",
    "InvalidChunkSizeError",
    "InvalidDimensionError",
    "feature_group_stats",
    "load_table",
    "melt",
    "salted_join",
    "two_phase_agg",
    "write_bucketed_table",
    "write_per_group_csv",
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
    "release_caches",
    "tracked_count",
    "validate_obs_partition",
]
