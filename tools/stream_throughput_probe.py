"""Structured Streaming throughput probe: drive the REAL streaming path
(file source → stateful operator → sink, Trigger.AvailableNow) over the
sf0.1 events table and report end-to-end rows/s per operator.

Why this exists: the bench's `stream_*` entries time the BATCH TWINS (the
oracle-checkable form); the streaming engine itself — micro-batch
planning, state store put/get, watermark advancement, applyInPandasWithState
Arrow hops — is exercised by pytest for correctness but its throughput was
unmeasured.  This probe closes that: same operators, genuine
readStream/writeStream, multi-file source so AvailableNow actually runs
several micro-batches (state carries across batches instead of one
degenerate mega-batch).

Each measurement: copy the events parquet into ``n_files`` equal row
slices (separate files → separate micro-batch candidates with
maxFilesPerTrigger=ceil(n/4) → ~4 micro-batches), run the query to
completion against a noop-style memory sink, report wall seconds and
rows/s of SOURCE rows (the honest denominator — output cardinality
differs per operator).

Usage: python tools/stream_throughput_probe.py [sf_dir] [n_files]
One JSON line per operator.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_mwu_spark.session import get_spark
from dask_mwu_spark.streaming.events import (
    dedup_stream,
    sessionize_stream,
    anomaly_stream,
    stream_events,
    windowed_event_stats,
)


def slice_events(spark, sf_dir: str, out_dir: str, n_files: int) -> int:
    """Write the events table as n_files TIME-RANGE slices (each slice a
    single file, written oldest-range first) and return the row count.

    Two correctness-of-the-probe points learned the hard way:
    - Read through ``load_table`` (the normalized BIGINT-nanos ts), not
      a raw ``spark.read.parquet`` — the raw read round-trips the NANOS
      timestamp into a µs TimestampType file that the stream schema then
      reinterprets as nanos, compressing the whole corpus into one
      event-time window (drift_monitor measured 0 output rows).
    - Slices must be TIME-ordered and arrive in time order: a
      round-robin split puts every day in every micro-batch, so after
      batch 1 the watermark sits at global-max minus the lateness and
      later batches are entirely late.  The file source picks oldest
      mod-time first, so the slices are written sequentially (oldest
      range first) — this also preserves per-key arrival order, the
      sessionizer's contract."""
    from dask_mwu_spark.sources.loaders import load_table

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    cuts = ev.stat.approxQuantile(
        "ts", [i / n_files for i in range(1, n_files)], 0.001
    )
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_files):
        sl = ev
        if i > 0:
            sl = sl.where(F.col("ts") >= cuts[i - 1])
        if i < n_files - 1:
            sl = sl.where(F.col("ts") < cuts[i])
        tmp = os.path.join(out_dir, f"_tmp_{i}")
        sl.sort("ts").coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(
            os.path.join(tmp, part), os.path.join(out_dir, f"{i:04d}.parquet")
        )
        shutil.rmtree(tmp)
        time.sleep(0.05)  # strictly increasing mod times
    return n


def run_stream(spark, df_stream, name: str, n_rows: int, ckpt: str) -> None:
    t0 = time.time()
    q = (
        df_stream.writeStream.format("memory")
        .queryName(f"probe_{name}")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    out_rows = spark.sql(f"SELECT count(*) c FROM probe_{name}").collect()[0].c
    batches = q.lastProgress["batchId"] + 1 if q.lastProgress else None
    print(
        json.dumps(
            {
                "metric": f"stream_probe_{name}",
                "value": round(wall, 2),
                "unit": "sec",
                "source_rows": n_rows,
                "rows_per_sec": int(n_rows / wall),
                "output_rows": out_rows,
                "micro_batches": batches,
            }
        ),
        flush=True,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("stream-throughput-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_probe_")
    try:
        src = os.path.join(work, "events")
        n_rows = slice_events(spark, sf_dir, src, n_files)
        per_trigger = math.ceil(n_files / 4)

        def source():
            return stream_events(
                spark, src, max_files_per_trigger=per_trigger
            )

        # watermarked tumbling-window aggregation (append mode emits only
        # finalized windows; AvailableNow still pushes every row through
        # the state store)
        run_stream(
            spark,
            windowed_event_stats(source(), watermark="10 minutes"),
            "windowed_agg",
            n_rows,
            os.path.join(work, "ckpt_w"),
        )
        # watermarked dropDuplicates
        run_stream(
            spark,
            dedup_stream(source(), watermark="10 minutes"),
            "dedup",
            n_rows,
            os.path.join(work, "ckpt_d"),
        )
        # applyInPandasWithState sessionization (per-user custom state)
        run_stream(
            spark,
            sessionize_stream(source()),
            "sessionize",
            n_rows,
            os.path.join(work, "ckpt_s"),
        )
        # applyInPandasWithState streaming anomaly scorer (O(1)/user state)
        run_stream(
            spark,
            anomaly_stream(source()),
            "anomaly",
            n_rows,
            os.path.join(work, "ckpt_a"),
        )
        # windowed PSI drift monitor (round 5): conditional-sum bin
        # histogram in ONE stateful aggregate + broadcast static ref
        from dask_mwu_spark.streaming.events import drift_monitor

        ref = spark.read.parquet(f"{sf_dir}/events.parquet").where(
            F.col("user_id") % 2 == 0
        )
        run_stream(
            spark,
            drift_monitor(
                source(),
                ref,
                breaks=[15.0, 35.0, 70.0, 150.0],
                window="1 day",
                watermark="10 minutes",
            ),
            "drift_monitor",
            n_rows,
            os.path.join(work, "ckpt_dm"),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
