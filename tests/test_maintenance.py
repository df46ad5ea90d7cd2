"""Compaction / clustered-rewrite semantics on a deliberately fragmented
table."""

import os

import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.sources.maintenance import (
    compact,
    file_key_ranges,
    parquet_files,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    """300k rows sprayed across ~40 small files (the streaming-sink shape)."""
    path = str(tmp_path / "frag.parquet")
    (
        spark.range(300_000)
        .select(
            F.col("id").alias("k"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 10).alias("v"),
        )
        .repartition(40)
        .write.parquet(path)
    )
    return path


def _table_fingerprint(spark, path):
    df = spark.read.parquet(path)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sk"),
        F.round(F.sum("v"), 3).alias("sv"),
    ).collect()[0]
    return (row.n, row.sk, row.sv)


def test_compact_reduces_files_preserves_data(spark, fragmented):
    before = _table_fingerprint(spark, fragmented)
    assert len(parquet_files(fragmented)) == 40
    stats = compact(spark, fragmented, target_file_mb=1)
    assert stats["files_before"] == 40
    # a few MB of data at 1 MB target -> a handful of files, far fewer than 40
    assert 2 <= stats["files_after"] <= 8
    assert _table_fingerprint(spark, fragmented) == before


def test_clustered_compact_yields_disjoint_key_ranges(spark, fragmented):
    before = _table_fingerprint(spark, fragmented)
    compact(spark, fragmented, target_file_mb=1, cluster_by="k")
    assert _table_fingerprint(spark, fragmented) == before
    ranges = sorted(file_key_ranges(fragmented, "k"))
    assert len(ranges) >= 2  # actually produced multiple clustered files
    # full coverage and pairwise disjoint: file i's max < file i+1's min
    assert ranges[0][0] == 0 and ranges[-1][1] == 299_999
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert lo_a <= hi_a < lo_b


def test_compact_swap_leaves_no_temp_dirs(spark, fragmented):
    compact(spark, fragmented, target_file_mb=1)
    parent = os.path.dirname(fragmented)
    leftovers = [d for d in os.listdir(parent) if "__compact" in d or "__old" in d]
    assert leftovers == []
