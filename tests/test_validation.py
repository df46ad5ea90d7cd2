"""V1/V2 + M1/A2 tests (reference tests/test_get_masks.py error paths)."""

import pytest

from dask_mwu_spark.errors import EmptyArrayError, NotPartitionError
from dask_mwu_spark.operators.groups import distinct_groups, group_sizes
from dask_mwu_spark.operators.validation import validate_obs_partition


def _obs(spark, rows):
    return spark.createDataFrame(rows, schema="obs_id long, group string")


def test_distinct_groups_sorted(spark):
    obs = _obs(spark, [(0, "c"), (1, "a"), (2, "b"), (3, "a")])
    got = [r.group for r in distinct_groups(obs).collect()]
    assert got == ["a", "b", "c"]  # np.unique sort semantics (M1)


def test_group_sizes_complement(spark):
    obs = _obs(spark, [(0, "a"), (1, "a"), (2, "b"), (3, "c")])
    got = {r.group: (r.n1, r.n2) for r in group_sizes(obs).collect()}
    assert got == {"a": (2, 2), "b": (1, 3), "c": (1, 3)}


def test_null_label_rejected(spark):
    obs = _obs(spark, [(0, "a"), (1, None)])
    with pytest.raises(NotPartitionError):
        validate_obs_partition(obs)


def test_duplicate_obs_rejected(spark):
    obs = _obs(spark, [(0, "a"), (0, "b")])
    with pytest.raises(NotPartitionError):
        validate_obs_partition(obs)


def test_empty_rejected(spark):
    obs = _obs(spark, [])
    with pytest.raises(EmptyArrayError):
        validate_obs_partition(obs)


def test_valid_partition_passes(spark):
    obs = _obs(spark, [(0, "a"), (1, "b")])
    validate_obs_partition(obs)  # no raise
