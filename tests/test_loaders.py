"""Loader normalization: events.ts must come out as epoch-nanos BIGINT
regardless of the parquet physical encoding.

The driver-generated testdata has shipped ``ts`` two different ways across
rounds — TIMESTAMP(NANOS) (BIGINT under nanosAsLong) in round 1, then
TIMESTAMP(MICROS) (TIMESTAMP_NTZ) in round 2, which broke every event-time
query until load_table normalized at the source.  These tests pin both
encodings to the same epoch-nanos output so a future re-generation can't
regress it silently again.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dask_mwu_spark.sources.loaders import load_table

ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 11, 12],
    "event_type": ["a", "b", "c"],
    "value": [1.0, 2.0, 3.0],
    "props": ["{}", "{}", "{}"],
}
# pandas datetimes (naive == UTC in this dataset's convention)
TS = pd.to_datetime(
    [
        "2024-01-01 00:00:00.000001",
        "2024-06-15 12:34:56.789012",
        "2026-01-01 00:00:00.000000",
    ]
)
EXPECT_NS = [int(t.value) for t in TS]  # pandas Timestamp.value is epoch-nanos


def _write(tmp_path, name, ts_array):
    import os

    tbl = pa.table({**{k: pa.array(v) for k, v in ROWS.items()}, "ts": ts_array})
    path = str(tmp_path / name)
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, f"{path}/events.parquet")
    return path


@pytest.mark.parametrize(
    "unit",
    ["us", "ns"],
)
def test_ts_normalized_to_epoch_nanos(spark, tmp_path, unit):
    ts_array = pa.array(TS.astype(f"datetime64[{unit}]"), pa.timestamp(unit))
    sf_dir = _write(tmp_path, f"enc_{unit}", ts_array)
    df = load_table(spark, sf_dir, "events")
    (dtype,) = [t for c, t in df.dtypes if c == "ts"]
    assert dtype == "bigint"
    got = {r["event_id"]: r["ts"] for r in df.select("event_id", "ts").collect()}
    assert [got[i] for i in (1, 2, 3)] == EXPECT_NS


def test_ts_ntz_exact_under_non_utc_session(spark, tmp_path):
    """The NTZ naive-as-UTC interpretation must hold whatever the session
    timezone, and loading must NOT mutate the session timezone as a side
    effect (ADVICE r3: the old implementation pinned
    spark.sql.session.timeZone=UTC for the rest of the session)."""
    ts_array = pa.array(TS.astype("datetime64[us]"), pa.timestamp("us"))
    sf_dir = _write(tmp_path, "enc_tz", ts_array)
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, sf_dir, "events")
        got = {r["event_id"]: r["ts"] for r in df.select("event_id", "ts").collect()}
        assert [got[i] for i in (1, 2, 3)] == EXPECT_NS
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_ts_ltz_instant_based(spark, tmp_path):
    """Parquet isAdjustedToUTC=true (read as TIMESTAMP LTZ): unix_micros is
    instant-based, so the stored int64 round-trips bit-for-bit."""
    ts_array = pa.array(TS.astype("datetime64[us]"), pa.timestamp("us", tz="UTC"))
    sf_dir = _write(tmp_path, "enc_ltz", ts_array)
    df = load_table(spark, sf_dir, "events")
    (dtype,) = [t for c, t in df.dtypes if c == "ts"]
    assert dtype == "bigint"
    got = {r["event_id"]: r["ts"] for r in df.select("event_id", "ts").collect()}
    assert [got[i] for i in (1, 2, 3)] == EXPECT_NS


def test_ts_already_bigint_passthrough(spark, tmp_path):
    ts_array = pa.array(EXPECT_NS, pa.int64())
    sf_dir = _write(tmp_path, "enc_long", ts_array)
    df = load_table(spark, sf_dir, "events")
    (dtype,) = [t for c, t in df.dtypes if c == "ts"]
    assert dtype == "bigint"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == sorted(EXPECT_NS)
