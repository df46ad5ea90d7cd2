"""Structured Streaming: stream/batch equivalence of the mode-agnostic
transformations, watermark wiring, and stateful sessionization."""

import pytest
from pyspark.sql import functions as F

from dask_mwu_spark.sources.loaders import load_table
from dask_mwu_spark.streaming import (
    EVENTS_SCHEMA,
    dedup_stream,
    interval_join_events,
    sessionize_batch,
    sessionize_stream,
    stream_events,
    windowed_event_stats,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events rewritten as a 4-file parquet directory (a stream source needs
    a directory it can list; ts becomes plain BIGINT nanos on rewrite)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    # hash-partition by user so each user's history is within ONE file:
    # the stateful sessionizer (like any per-key stream op) assumes per-key
    # ordered arrival across microbatches, and the file source may split
    # the backfill into several batches in arbitrary file order
    load_table(spark, sf_dir, "events").repartition(4, "user_id").write.mode(
        "overwrite"
    ).parquet(out)
    return out


def _run_stream(sdf, name: str, *, output_mode: str) -> None:
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_windowed_stats_stream_equals_batch(spark, sf_dir, events_dir):
    batch = windowed_event_stats(load_table(spark, sf_dir, "events")).collect()
    stream = windowed_event_stats(
        stream_events(spark, events_dir), watermark="2 minutes"
    )
    assert stream.isStreaming
    _run_stream(stream, "win_stats", output_mode="complete")
    got = spark.sql("SELECT * FROM win_stats").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) > 10


def test_windowed_stats_append_respects_watermark(spark, events_dir):
    """Append mode emits only windows the watermark has closed — subset of
    the complete result, missing at least the final window."""
    stream = windowed_event_stats(
        stream_events(spark, events_dir), watermark="2 minutes"
    )
    _run_stream(stream, "win_append", output_mode="append")
    appended = {
        tuple(r) for r in spark.sql("SELECT * FROM win_append").collect()
    }
    complete = {
        tuple(r)
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    assert appended <= complete
    max_start = max(r[0] for r in complete)
    assert all(r[0] < max_start for r in appended)


def test_sessionize_stream_closed_sessions_match_batch(spark, sf_dir, events_dir):
    """Every session the stream CLOSES must equal the batch result row;
    the still-open tail session per user is withheld by definition."""
    batch = sessionize_batch(load_table(spark, sf_dir, "events"))
    last = batch.groupBy("user_id").agg(F.max("session_idx").alias("last_idx"))
    closed_expected = {
        tuple(r)
        for r in batch.join(last, "user_id")
        .where(F.col("session_idx") < F.col("last_idx"))
        .drop("last_idx")
        .collect()
    }
    stream = sessionize_stream(stream_events(spark, events_dir))
    assert stream.isStreaming
    _run_stream(stream, "sessions", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM sessions").collect()}
    assert got == closed_expected
    assert len(got) > 50


def test_sessionize_batch_properties(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize_batch(ev).collect()
    n_events = ev.count()
    assert sum(r.n_events for r in sess) == n_events
    for r in sess:
        assert r.t_start <= r.t_end
    # gap invariant: consecutive sessions of a user are > gap apart
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.session_idx)
        assert [r.session_idx for r in rows] == list(range(len(rows)))
        for a, b in zip(rows, rows[1:]):
            assert b.t_start - a.t_end > 300 * 10**6


def test_dedup_stream_matches_batch_distinct(spark, sf_dir, events_dir):
    """Streaming dropDuplicatesWithinWatermark keeps exactly one row per
    content key — the same key set as batch distinct."""
    keys = ["user_id", "event_type"]
    batch_keys = {
        tuple(r)
        for r in load_table(spark, sf_dir, "events").select(*keys).distinct().collect()
    }
    stream = dedup_stream(
        stream_events(spark, events_dir), keys=tuple(keys), watermark="10 minutes"
    ).select(*keys)
    _run_stream(stream, "dedup_ev", output_mode="append")
    got = [tuple(r) for r in spark.sql("SELECT * FROM dedup_ev").collect()]
    assert len(got) == len(set(got))  # no key emitted twice
    assert set(got) == batch_keys
    assert len(got) > 50  # 15 users x 5 event types at sf0.001


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, events_dir):
    """Stream-stream inner join (purchases x preceding clicks within 10 min)
    must emit exactly the batch join's pairs."""
    ev = load_table(spark, sf_dir, "events")
    # events are sparse (~11 h mean per-user gap) — 24 h window gives a
    # meaningful pair count
    gap_us = 24 * 3600 * 10**6
    batch = {
        tuple(r)
        for r in interval_join_events(
            ev.where(F.col("event_type") == "purchase"),
            ev.where(F.col("event_type") == "click"),
            gap_us=gap_us,
        ).collect()
    }
    s_ev = stream_events(spark, events_dir)
    stream = interval_join_events(
        s_ev.where(F.col("event_type") == "purchase"),
        s_ev.where(F.col("event_type") == "click"),
        gap_us=gap_us,
        watermark="48 hours",
    )
    assert stream.isStreaming
    _run_stream(stream, "ssj", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM ssj").collect()}
    assert got == batch
    assert len(got) > 20


def test_stream_source_schema(spark, events_dir):
    sdf = stream_events(spark, events_dir)
    assert sdf.isStreaming
    assert sdf.schema == EVENTS_SCHEMA


def test_enrich_stream_equals_batch(spark, sf_dir, events_dir):
    """Stream-static broadcast enrichment: stateless (no watermark) and
    result-identical to the batch twin."""
    from pyspark.sql import functions as F

    from dask_mwu_spark.streaming.events import enrich_events

    dim = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment"
    )

    def stats(ev):
        return enrich_events(ev, dim).groupBy("c_mktsegment", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )

    batch = stats(load_table(spark, sf_dir, "events")).collect()
    stream = stats(stream_events(spark, events_dir))
    assert stream.isStreaming
    _run_stream(stream, "enriched", output_mode="complete")
    got = spark.sql("SELECT * FROM enriched").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) >= 5


def test_anomaly_stream_equals_batch(spark, sf_dir, events_dir):
    """Every row the stream emits must match the batch z-scores exactly —
    the running (n, Σv, Σv²) state reproduces the batch window accumulation
    order, so even the float math agrees bit-for-bit."""
    from dask_mwu_spark.streaming import anomaly_batch, anomaly_stream

    batch = anomaly_batch(load_table(spark, sf_dir, "events")).collect()
    stream = anomaly_stream(stream_events(spark, events_dir))
    assert stream.isStreaming
    _run_stream(stream, "anomaly", output_mode="append")
    got = spark.sql("SELECT * FROM anomaly").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) >= 1000


def test_anomaly_batch_flags_planted_outlier(spark):
    import pandas as pd

    from dask_mwu_spark.streaming import anomaly_batch

    us = 1_000
    rows = [(1, i, i * 60 * 10**9, 10.0 + (i % 3) * 0.1, "t", None) for i in range(10)]
    rows.append((1, 99, 11 * 60 * 10**9 * 100, 500.0, "t", None))  # outlier
    ev = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts", "value", "event_type", "props"]
        )
    )
    got = anomaly_batch(ev).toPandas().set_index("event_id")
    assert got.loc[99].is_anomaly == True  # noqa: E712
    # warm-up rows have no score
    assert pd.isna(got.loc[0].z) and pd.isna(got.loc[4].z)
    assert got.loc[5].n_prior == 5


def test_upsert_sink_matches_batch_merge(spark, tmp_path):
    """Stream a 2-file changelog through upsert_sink (availableNow) and
    compare the materialized table with a batch latest-wins replay; then
    re-deliver a batch by hand to prove idempotency."""
    import pandas as pd
    from pyspark.sql import types as T

    from dask_mwu_spark.streaming.events import read_upsert_table, upsert_sink

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    b1 = pd.DataFrame(
        {"k": [1, 2, 3], "v": ["a1", "b1", "c1"], "seq": [10, 11, 12],
         "op": ["U", "U", "U"]}
    )
    # batch 2: update k=1 (newer), STALE update k=2 (older seq), delete k=3
    b2 = pd.DataFrame(
        {"k": [1, 2, 3], "v": ["a2", "b0", None], "seq": [20, 5, 21],
         "op": ["U", "U", "D"]}
    )
    # batch 3: stale upsert for the DELETED k=3 (seq 6 < the delete's 21)
    # arriving in a later batch — must NOT resurrect the key (needs the
    # tombstone; dropping deleted keys from storage fails this)
    b3 = pd.DataFrame(
        {"k": [3], "v": ["c0"], "seq": [6], "op": ["U"]}
    )
    # the file stream lists the directory FLAT (no recursion): land each
    # changelog batch as a single part file directly in log_dir
    import glob
    import shutil

    for i, frame in enumerate((b1, b2, b3)):
        staging = str(tmp_path / f"stage{i}")
        spark.createDataFrame(frame, schema).coalesce(1).write.parquet(staging)
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        shutil.move(part, str(log_dir / f"{i:04d}.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(log_dir))
    )
    table = str(tmp_path / "state")
    q = upsert_sink(
        stream, table, keys=["k"], seq_col="seq",
        checkpoint=str(tmp_path / "ckpt"), trigger_available_now=True,
    )
    q.awaitTermination(120)
    assert not q.isActive

    got = {r["k"]: (r["v"], r["_seq"]) for r in read_upsert_table(spark, table).collect()}
    # k=1 newest wins; k=2 stale row must NOT overwrite; k=3 deleted and
    # NOT resurrected by batch 3's stale upsert
    assert got == {1: ("a2", 20), 2: ("b1", 11)}
    # the delete survives in storage as a tombstone carrying its seq
    # (raw inspection goes through the committed manifest, never a bare
    # directory listing — round-5 atomic-publish layout)
    from dask_mwu_spark.sources import manifest as mf

    raw = {
        r["k"]: (r["_op"], r["_seq"])
        for r in spark.read.parquet(mf.committed_data_path(table)).collect()
    }
    assert raw[3] == ("D", 21)

    # idempotency: re-deliver the whole log through a fresh checkpoint
    # against the SAME table (crash-redelivery shape); state must not change
    q2 = upsert_sink(
        spark.readStream.schema(schema).parquet(str(log_dir)),
        table, keys=["k"], seq_col="seq",
        checkpoint=str(tmp_path / "ckpt2"), trigger_available_now=True,
    )
    q2.awaitTermination(120)
    got2 = {r["k"]: (r["v"], r["_seq"]) for r in read_upsert_table(spark, table).collect()}
    assert got2 == got


def test_drift_monitor_stream_equals_batch(spark, sf_dir, events_dir):
    from dask_mwu_spark.streaming import drift_monitor

    ev = load_table(spark, sf_dir, "events")
    ref = ev.where(F.col("user_id") % 2 == 0)
    breaks = [15.0, 35.0, 70.0, 150.0]
    batch = drift_monitor(ev, ref, breaks=breaks, window="1 day").collect()
    stream = drift_monitor(
        stream_events(spark, events_dir),
        ref,
        breaks=breaks,
        window="1 day",
        watermark="2 minutes",
    )
    assert stream.isStreaming
    _run_stream(stream, "drift_mon", output_mode="complete")
    got = spark.sql("SELECT * FROM drift_mon").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # every (window, bin) cell is present, including zero-count bins
    assert len(got) == len({r.window_start for r in got}) * 5


def test_drift_monitor_flags_planted_shift(spark):
    # reference uniform in bin 1-2; live shifted into the top bin:
    # psi must be large where mass appeared/vanished
    import pandas as pd

    from dask_mwu_spark.streaming import drift_monitor

    base_ts = 1_700_000_000_000_000_000  # epoch nanos
    ref_rows = [(i, base_ts, i, "a", 10.0 + (i % 2) * 20, "{}") for i in range(100)]
    live_rows = [(i, base_ts, i, "a", 200.0, "{}") for i in range(100)]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ref = spark.createDataFrame(pd.DataFrame(ref_rows, columns=cols))
    live = spark.createDataFrame(pd.DataFrame(live_rows, columns=cols))
    out = drift_monitor(
        live, ref, breaks=[15.0, 35.0, 70.0, 150.0], window="1 day"
    ).toPandas()
    top = out.set_index("bin")
    assert top.loc[5].frac == 1.0 and top.loc[5].frac_ref == 0.0
    assert top.loc[5].psi > 5.0  # ln(1/eps) scale
    assert (out.psi >= 0).all()


def test_drift_monitor_excludes_null_values(spark):
    # ADVICE r5: NULL values must not silently inflate bin 1 — they are
    # excluded before binning on BOTH the live and reference paths.
    from dask_mwu_spark.streaming import drift_monitor

    base_ts = 1_700_000_000_000_000_000  # epoch nanos
    # 10 real values in bin 1 (<= 15) + 5 NULLs; ref: same shape
    rows = [(i, base_ts, i, "a", 5.0, "{}") for i in range(10)] + [
        (100 + i, base_ts, i, "a", None, "{}") for i in range(5)
    ]
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    live = spark.createDataFrame(rows, schema)
    out = drift_monitor(
        live, live, breaks=[15.0, 35.0, 70.0, 150.0], window="1 day"
    ).toPandas().set_index("bin")
    # bin 1 counts ONLY the 10 non-null rows, not 15
    assert out.loc[1].n_obs == 10 and out.loc[1].n_ref == 10
    assert out.loc[1].frac == 1.0 and out.loc[1].frac_ref == 1.0


def test_drift_monitor_append_respects_watermark(spark, sf_dir, events_dir):
    """Append mode emits only watermark-closed windows — a strict subset of
    the complete result, missing at least the final window's bins."""
    from dask_mwu_spark.streaming import drift_monitor

    ev = load_table(spark, sf_dir, "events")
    ref = ev.where(F.col("user_id") % 2 == 0)
    breaks = [15.0, 35.0, 70.0, 150.0]
    batch = drift_monitor(ev, ref, breaks=breaks, window="1 day").collect()
    stream = drift_monitor(
        stream_events(spark, events_dir),
        ref,
        breaks=breaks,
        window="1 day",
        watermark="2 minutes",
    )
    _run_stream(stream, "drift_append_t", output_mode="append")
    got = spark.sql("SELECT * FROM drift_append_t").collect()
    batch_set = set(map(tuple, batch))
    got_set = set(map(tuple, got))
    assert got_set <= batch_set
    assert 0 < len(got_set) < len(batch_set)
    # the held-back rows are exactly the unclosed final window's bins
    missing_windows = {r[0] for r in batch_set - got_set}
    assert missing_windows == {max(r.window_start for r in batch)}
