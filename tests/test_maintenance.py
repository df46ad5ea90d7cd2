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


def test_zorder_key_matches_python_interleave(spark):
    import pandas as pd

    from dask_mwu_spark.sources.maintenance import zorder_key

    df = spark.createDataFrame(
        pd.DataFrame({"a": [0, 1, 2, 3, 1023, 513], "b": [0, 1, 3, 0, 1023, 2]})
    )
    got = df.select("a", "b", zorder_key("a", "b", bits=10).alias("z")).collect()

    def interleave(a, b):
        z = 0
        for i in range(10):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for r in got:
        assert r.z == interleave(r.a, r.b), (r.a, r.b)
    # ordering sanity: (0,0) < (0,1) < (1,0) < (1,1) in Morton order
    assert interleave(0, 0) < interleave(0, 1) < interleave(1, 0) < interleave(1, 1)


def test_zorder_clustering_bounds_both_dimensions(spark, tmp_path):
    """Z-order clustered files cover tight rectangles in BOTH dims;
    single-column clustering leaves the other dim spanning ~everything —
    the multi-dimensional skipping argument, verified via footers."""
    from pyspark.sql import functions as F

    from dask_mwu_spark.sources.maintenance import (
        compact,
        file_key_ranges,
        zorder_key,
    )

    def fresh(name):
        path = str(tmp_path / name)
        (
            spark.range(800_000)
            .select(
                F.pmod(F.xxhash64("id"), F.lit(1024)).alias("a"),
                F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1024)).alias("b"),
                F.col("id").alias("payload"),
            )
            .repartition(16)
            .write.parquet(path)
        )
        return path

    def mean_span(path, col):
        ranges = file_key_ranges(path, col)
        assert ranges
        return sum(hi - lo for lo, hi in ranges) / len(ranges)

    zpath = fresh("z.parquet")
    compact(spark, zpath, target_file_mb=1, cluster_by=zorder_key("a", "b", bits=10))
    one = fresh("one.parquet")
    compact(spark, one, target_file_mb=1, cluster_by="a")

    n_files = len(file_key_ranges(zpath, "a"))
    assert n_files >= 4
    # single-column clustering: 'a' tight, 'b' spans ~full range per file
    assert mean_span(one, "a") < 1024 / 2
    assert mean_span(one, "b") > 1024 * 0.9
    # z-order: BOTH dims bounded below the global span
    assert mean_span(zpath, "a") < 1024 * 0.8
    assert mean_span(zpath, "b") < 1024 * 0.8
