"""Commit-manifest protocol (sources/manifest.py): atomic publish for the
upsert sink and compaction (VERDICT r4 item 5) — crash injection between
data write and publish must leave readers on the previous consistent
version."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.sources import maintenance, manifest as mf


def _write_version(spark, table, values):
    df = spark.createDataFrame(pd.DataFrame({"k": list(range(len(values))), "v": values}))
    d = mf.new_data_dir(str(table), tag="t")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_publish_and_resolve(spark, tmp_path):
    table = tmp_path / "t"
    table.mkdir()
    d0 = _write_version(spark, table, [1.0, 2.0])
    assert mf.committed_data_path(str(table)) is None  # nothing committed yet
    v = mf.publish_version(str(table), d0)
    assert v == 0
    assert mf.committed_data_path(str(table)) == d0
    d1 = _write_version(spark, table, [3.0, 4.0])
    assert mf.publish_version(str(table), d1) == 1
    assert mf.committed_data_path(str(table)) == d1
    got = sorted(
        r["v"] for r in spark.read.parquet(mf.committed_data_path(str(table))).collect()
    )
    assert got == [3.0, 4.0]


def test_crash_before_publish_is_invisible(spark, tmp_path):
    """The crash window the old rename-swap had: data written, commit not
    published. Readers must still resolve the previous version."""
    table = tmp_path / "t"
    table.mkdir()
    d0 = _write_version(spark, table, [1.0])
    mf.publish_version(str(table), d0)
    # writer crashes after writing the new data dir, before publishing
    _write_version(spark, table, [99.0])
    assert mf.committed_data_path(str(table)) == d0
    assert [r["v"] for r in spark.read.parquet(mf.committed_data_path(str(table))).collect()] == [1.0]
    # vacuum removes the orphan, keeps the committed version
    removed = mf.vacuum(str(table), keep=2)
    assert len(removed) == 1
    assert mf.committed_data_path(str(table)) == d0


def test_version_collision_raises(spark, tmp_path, monkeypatch):
    table = tmp_path / "t"
    table.mkdir()
    d0 = _write_version(spark, table, [1.0])
    mf.publish_version(str(table), d0)
    d1 = _write_version(spark, table, [2.0])
    # simulate the lost-update race: a concurrent writer read the same
    # "latest" snapshot (None) and targets the already-taken version 0
    monkeypatch.setattr(mf, "latest_version", lambda p: None)
    with pytest.raises(FileExistsError):
        mf.publish_version(str(table), d1)
    monkeypatch.undo()
    # the committed state is untouched by the failed publish
    assert mf.committed_data_path(str(table)) == d0


def test_vacuum_keeps_recent_versions(spark, tmp_path):
    table = tmp_path / "t"
    table.mkdir()
    dirs = []
    for i in range(4):
        d = _write_version(spark, table, [float(i)])
        mf.publish_version(str(table), d)
        dirs.append(d)
    removed = mf.vacuum(str(table), keep=2)
    assert sorted(removed) == sorted(os.path.basename(d) for d in dirs[:2])
    assert mf.latest_version(str(table)) == 3
    # previous version still readable (in-flight reader protection)
    assert os.path.isdir(dirs[2]) and os.path.isdir(dirs[3])


def test_upsert_sink_crash_injection(spark, tmp_path, monkeypatch):
    """Kill the sink between parquet write and manifest publish; the
    reader must still see the previous consistent table, and a rerun must
    converge."""
    from dask_mwu_spark.streaming.events import read_upsert_table, upsert_sink

    src = tmp_path / "src"
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0], "seq": [1, 2], "op": ["U", "U"]}).to_parquet(
        src / "b1.parquet"
    )
    stream = (
        spark.readStream.schema("k long, v double, seq long, op string")
        .parquet(str(src))
    )
    q = upsert_sink(
        stream, table, keys=["k"], seq_col="seq", checkpoint=ckpt,
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in read_upsert_table(spark, table).collect()}
    assert got == {1: 10.0, 2: 20.0}
    v_before = mf.latest_version(table)

    # second batch arrives, but the writer "crashes" before publishing
    pd.DataFrame({"k": [1], "v": [11.0], "seq": [3], "op": ["U"]}).to_parquet(
        src / "b2.parquet"
    )
    boom = RuntimeError("injected crash before publish")

    def crash(*a, **kw):
        raise boom

    monkeypatch.setattr(mf, "publish_version", crash)
    stream2 = (
        spark.readStream.schema("k long, v double, seq long, op string")
        .parquet(str(src))
    )
    q2 = upsert_sink(
        stream2, table, keys=["k"], seq_col="seq",
        checkpoint=str(tmp_path / "ckpt2"), trigger_available_now=True,
    )
    failed = False
    try:
        q2.awaitTermination(120)
    except Exception:
        failed = True
    finally:
        if q2.isActive:
            q2.stop()
    assert failed, "injected crash should have failed the stream"
    # table untouched: same version, same contents
    assert mf.latest_version(table) == v_before
    got = {r["k"]: r["v"] for r in read_upsert_table(spark, table).collect()}
    assert got == {1: 10.0, 2: 20.0}

    # recovery: rerun without the fault converges to the merged state
    monkeypatch.undo()
    stream3 = (
        spark.readStream.schema("k long, v double, seq long, op string")
        .parquet(str(src))
    )
    q3 = upsert_sink(
        stream3, table, keys=["k"], seq_col="seq",
        checkpoint=str(tmp_path / "ckpt3"), trigger_available_now=True,
    )
    q3.awaitTermination(120)
    got = {r["k"]: r["v"] for r in read_upsert_table(spark, table).collect()}
    assert got == {1: 11.0, 2: 20.0}


def test_compact_versioned_atomic(spark, tmp_path, monkeypatch):
    """Compaction of a manifest table publishes atomically; a crash before
    publish leaves the old version fully readable."""
    table = tmp_path / "t"
    os.makedirs(table)
    df = spark.createDataFrame(pd.DataFrame({"k": range(100), "v": [float(i) for i in range(100)]}))
    df.repartition(8).write.mode("overwrite").parquet(str(table))
    maintenance.to_versioned(spark, str(table))
    before = mf.committed_data_path(str(table))
    assert spark.read.parquet(before).count() == 100

    monkeypatch.setattr(mf, "publish_version", lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("boom")))
    with pytest.raises(RuntimeError):
        maintenance.compact(spark, str(table), target_file_mb=1)
    assert mf.committed_data_path(str(table)) == before
    assert spark.read.parquet(mf.committed_data_path(str(table))).count() == 100

    monkeypatch.undo()
    stats = maintenance.compact(spark, str(table), target_file_mb=1)
    assert stats["files_after"] <= stats["files_before"]
    after = mf.committed_data_path(str(table))
    assert after != before
    assert sorted(r["k"] for r in spark.read.parquet(after).collect()) == list(range(100))


def test_to_versioned_migration_roundtrip(spark, tmp_path):
    table = tmp_path / "t"
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3]}))
    df.write.mode("overwrite").parquet(str(table))
    v = maintenance.to_versioned(spark, str(table))
    assert v == 0
    assert sorted(
        r["k"] for r in spark.read.parquet(mf.committed_data_path(str(table))).collect()
    ) == [1, 2, 3]
    # idempotent
    assert maintenance.to_versioned(spark, str(table)) == 0
