"""Structured Streaming operators over the events table.

No counterpart in the reference — it has no streaming at all (SURVEY.md
section 2.1); this is the Stage-4 stream-processing surface, built the
idiomatic Spark way: transformations are written once against DataFrames and
run unchanged in BATCH and STREAMING mode (``windowed_event_stats`` is the
same function in both paths), so the batch twin is DuckDB-oracle-checkable
while the streaming path adds only source/sink/watermark wiring.

Scale design:
- windowed aggregation shuffles on (window, event_type) — bounded key space,
  partial aggregation map-side; watermark bounds state to
  (#windows in watermark horizon × #event types).
- sessionization keys state by user_id (uniform hash); streaming state per
  user is O(1) (running session aggregate, not the event list), timeout
  evicts idle users, so state size ~ #active users, not #events.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# events.parquet physical schema under nanosAsLong: ts is epoch-nanos BIGINT
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

NS_PER_US = 1_000


def ts_us(ts_ns: Column | str) -> Column:
    """epoch-nanos BIGINT → epoch-micros BIGINT by EXACT floor division.

    ``(col / 1000).cast("long")`` would be DOUBLE division — at 2026-epoch
    nano magnitudes (~1.7e18) the quotient rounds before the cast truncates,
    landing one µs off on roughly half of all timestamps.  Subtracting
    ``pmod(ts, 1000)`` first makes the numerator an exact multiple of 1000,
    so the decimal divide is remainder-free and the result is TRUE floor
    division — matching Python ``//`` bit-for-bit for negative (pre-epoch)
    timestamps too (round-7 review fix: the previous decimal-divide+cast
    truncated toward zero, one µs above ``//`` on every pre-1970 value,
    which the streaming twins' ``int(ts) // 1000`` folds use).
    """
    c = F.col(ts_ns) if isinstance(ts_ns, str) else ts_ns
    return (
        (c - F.pmod(c, F.lit(NS_PER_US))).cast("decimal(30,0)")
        / F.lit(NS_PER_US)
    ).cast("long")


def event_time(ts_ns: Column | str) -> Column:
    """epoch-nanos BIGINT → TimestampType at microsecond precision."""
    return F.timestamp_micros(ts_us(ts_ns))


def stream_events(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory. The schema must
    be supplied explicitly (streaming sources don't infer)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_stats(
    events: DataFrame,
    *,
    window: str = "1 minute",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count/sum/mean of ``value`` per event_type.

    Mode-agnostic: pass a batch DataFrame and it is a plain grouped
    aggregate; pass a stream (with ``watermark=``) and it becomes a
    watermarked stateful aggregation that emits finalized windows and drops
    state past the horizon. Output keys the window by its epoch-seconds
    start for cross-engine comparability.
    """
    ev = events.withColumn("event_time", event_time("ts"))
    if watermark is not None:
        ev = ev.withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def drift_monitor(
    events: DataFrame,
    ref: DataFrame,
    *,
    breaks: list[float],
    value_col: str = "value",
    window: str = "1 day",
    watermark: str | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Windowed PSI drift monitor: per event-time window, the Population
    Stability Index of the live ``value`` distribution against a STATIC
    reference distribution (``ref`` — e.g. last month's accepted
    snapshot).  The streaming form of ``audit.psi_drift``: the alert that
    fires when the feature a quality classifier was calibrated on starts
    looking different from what it was trained on.

    Mode-agnostic like the other operators here.  Streaming shape: the
    bin id is a stateless row expression; ONE watermarked windowed
    aggregate carries the bounded bin histogram as ``len(breaks)+1``
    conditional-sum COLUMNS (never a second stateful aggregate — chained
    streaming aggregations are the classic unsupported plan), so state
    per window is one fixed-width row; the window total is a ROW
    expression over those columns (exact BIGINT, no extra shuffle); the
    reference is a bounded static table that stream-static-joins
    (broadcast, stateless) after an explode to long form.

    NULL values are EXCLUDED before binning on both the event and the
    reference path (ADVICE r5: ``F.when(c > x, 1).otherwise(0)`` yields
    0 for NULL, so un-filtered NULLs would silently inflate bin 1's mass
    in both histograms); a monitor that must surface missingness should
    pair this with a separate null-rate aggregate rather than fold NULL
    into a value bin.

    Cross-engine exactness (batch twin): counts are exact BIGINTs,
    fractions are single divides, psi is the identical
    ``(max(fa,eps) - max(fb,eps)) * ln(max(fa,eps) / max(fb,eps))``
    tree as psi_drift, rounded to 6; the oracle mirrors the NULL filter
    with ``WHERE value IS NOT NULL``.

    Output: (window_start, bin, n_obs, n_ref, frac, frac_ref, psi).
    """
    bs = [float(x) for x in breaks]
    n_bins = len(bs) + 1

    def bin_expr(c: Column) -> Column:
        e = F.lit(1)
        for x in bs:
            e = e + F.when(c > F.lit(x), 1).otherwise(0)
        return e

    ev = events.filter(F.col(value_col).isNotNull()).withColumn(
        "event_time", event_time("ts")
    )
    if watermark is not None:
        ev = ev.withWatermark("event_time", watermark)
    binc = bin_expr(F.col(value_col).cast("double"))
    per_win = ev.groupBy(F.window("event_time", window).alias("w")).agg(
        *[
            F.sum(F.when(binc == i, 1).otherwise(0)).alias(f"_b{i}")
            for i in range(1, n_bins + 1)
        ]
    )
    total = F.col("_b1")
    for i in range(2, n_bins + 1):
        total = total + F.col(f"_b{i}")
    long = per_win.select(
        F.col("w.start").cast("long").alias("window_start"),
        total.alias("_tot"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bin"),
                        F.col(f"_b{i}").alias("n_obs"),
                    )
                    for i in range(1, n_bins + 1)
                ]
            )
        ).alias("_s"),
    ).select(
        "window_start",
        F.col("_s.bin").alias("bin"),
        F.col("_s.n_obs").alias("n_obs"),
        "_tot",
    )
    wall = Window.partitionBy()
    refc = (
        ref.filter(F.col(value_col).isNotNull())
        .select(
            bin_expr(F.col(value_col).cast("double")).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_ref"))
        .select(
            "bin",
            "n_ref",
            (
                F.col("n_ref").cast("double")
                / F.sum("n_ref").over(wall).cast("double")
            ).alias("_fref"),
        )
    )
    fa = F.col("n_obs").cast("double") / F.col("_tot").cast("double")
    fb = F.coalesce(F.col("_fref"), F.lit(0.0))
    fa_s = F.greatest(fa, F.lit(eps))
    fb_s = F.greatest(fb, F.lit(eps))
    return (
        long.join(F.broadcast(refc), "bin", "left")
        .select(
            "window_start",
            "bin",
            "n_obs",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.round(fa, 6).alias("frac"),
            F.round(fb, 6).alias("frac_ref"),
            F.round((fa_s - fb_s) * F.log(fa_s / fb_s), 6).alias("psi"),
        )
    )


def enrich_events(
    events: DataFrame,
    dim: DataFrame,
    *,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a slowly-
    changing dimension (user/account/device attributes).

    Mode-agnostic like the other operators here: with a batch DataFrame
    it's a plain broadcast join; with a stream it's Structured Streaming's
    stream-static join — STATELESS (no watermark, no state store), because
    the static side is re-broadcast per microbatch.  That is the correct
    100 TB shape for enrichment: the dimension is orders of magnitude
    smaller than the stream, so the stream never shuffles at all.  For a
    dimension too big to broadcast, pre-bucket both sides on the key
    (sources/bucketed.py) instead.
    """
    return events.join(F.broadcast(dim), on=key, how=how)


def interval_join_events(
    left: DataFrame,
    right: DataFrame,
    *,
    gap_us: int = 600 * 10**6,
    watermark: str | None = None,
) -> DataFrame:
    """Pair every LEFT event with each RIGHT event by the same user whose
    event time falls within ``gap_us`` microseconds BEFORE the left event
    (inclusive both ends) — e.g. purchases joined to the clicks that
    preceded them.

    The join's time-range predicate is DERIVED from ``gap_us`` (round-7
    review fix: the old signature took an independent ``gap`` interval
    string encoding the same bound, and a caller who changed one without
    the other got silently truncated results), so there is one source of
    truth for the window; event times are microsecond-truncated
    (``ts_us``), making the range predicate exactly the µs bound.

    Mode-agnostic: on batch DataFrames this is a plain time-bounded
    equi+range join; on streams (pass ``watermark=``) it becomes a
    stream-stream inner join where the time bound plus both watermarks let
    Spark expire join state — the canonical Structured Streaming two-stream
    pattern. Output: (user_id, left_event_id, right_event_id, gap_us).
    """
    l = left.select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("left_event_id"),
        ts_us("ts").alias("l_ts_us"),
        event_time("ts").alias("l_time"),
    )
    r = right.select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("right_event_id"),
        ts_us("ts").alias("r_ts_us"),
        event_time("ts").alias("r_time"),
    )
    if watermark is not None:
        l = l.withWatermark("l_time", watermark)
        r = r.withWatermark("r_time", watermark)
    joined = l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (
            F.col("r_time")
            >= F.col("l_time") - F.expr(f"INTERVAL {int(gap_us)} MICROSECOND")
        )
        & (F.col("r_time") <= F.col("l_time")),
    )
    # no trailing re-filter: the range predicate on µs-truncated times IS
    # the gap_us bound (and it must live in the join condition anyway so
    # streaming state expiry sees it)
    return joined.select(
        F.col("l_user").alias("user_id"),
        "left_event_id",
        "right_event_id",
        (F.col("l_ts_us") - F.col("r_ts_us")).alias("gap_us"),
    )


def dedup_stream(
    events: DataFrame,
    *,
    keys: tuple[str, ...] = ("user_id", "event_type", "value"),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup on a content key via
    ``dropDuplicatesWithinWatermark``: keeps the first arrival of each key;
    state for a key is dropped once the watermark passes its event time, so
    state size is bounded by the duplicate horizon, not the stream length —
    the streaming analog of the batch exact-dedup operator
    (operators/dedup.exact_dedup)."""
    ev = events.withColumn("event_time", event_time("ts")).withWatermark(
        "event_time", watermark
    )
    return ev.dropDuplicatesWithinWatermark(list(keys))


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("t_start", T.LongType()),  # epoch micros
        T.StructField("t_end", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# Session time arithmetic runs on MICROSECOND-truncated timestamps: the
# parquet nanos carry sub-microsecond noise that engines with µs timestamps
# (DuckDB TIMESTAMP) truncate away, so defining gap semantics at µs keeps
# session boundaries identical across engines.
GAP_US_DEFAULT = 300 * 10**6  # 5 minutes


def sessionize_batch(events: DataFrame, *, gap_us: int = GAP_US_DEFAULT) -> DataFrame:
    """Batch sessionization: split each user's event sequence at gaps
    > ``gap_us`` (µs); emit per-session aggregates.

    Classic lag/cumsum formulation — both window passes and the final
    aggregate share the user_id hash key, so Catalyst plans ONE Exchange +
    ONE Sort. Fully SQL-expressible → DuckDB oracle twin.
    """
    ev = events.select(
        "user_id",
        "event_id",
        ts_us("ts").alias("ts_us"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.select(
        "user_id",
        "ts_us",
        "value",
        F.sum(new_sess).over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_idx"),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("t_start"),
        F.max("ts_us").alias("t_end"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def sessionize_stream(
    events: DataFrame,
    *,
    gap_us: int = GAP_US_DEFAULT,
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``: per-user
    GroupState holds the OPEN session's running aggregate (O(1) per user —
    never the event list); a closed session is emitted as soon as an event
    past the gap arrives.

    ``state_timeout_ms`` (continuous streams only): flush idle users' open
    sessions after that much processing time. Leave ``None`` under
    ``Trigger.AvailableNow`` — a processing-time timeout makes AvailableNow
    keep scheduling empty microbatches until every timeout has fired, which
    turns a finite backfill into a multi-minute stage storm.

    Ordering contract: like any per-key stateful stream op, correctness
    requires each user's events to arrive in event-time order ACROSS
    microbatches (within a batch this function sorts). Kafka-keyed streams
    give this per partition; for file backfills, partition files by user.

    Emitted rows match ``sessionize_batch`` exactly for any prefix whose
    sessions are closed (the open tail differs by definition — it is not
    finished yet).
    """

    state_schema = T.StructType(
        [
            T.StructField("session_idx", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("t_start", T.LongType()),
            T.StructField("t_end", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )

    def _update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s_idx, n, t0, t1, sv = state.get
                closed.append((user_id, s_idx, n, t0, t1, round(sv, 6)))
                state.remove()
        else:
            if state.exists:
                s_idx, n, t0, t1, sv = state.get
            else:
                s_idx, n, t0, t1, sv = 0, 0, None, None, 0.0
            # fold in the BATCH TWIN's order — (microsecond-truncated ts,
            # event_id), not raw nanos (round-7 review fix: two events in
            # the same microsecond whose nano order disagrees with their
            # event_id order otherwise accumulate sum_value in a
            # different float order than sessionize_batch's window)
            rows = pd.concat(list(pdfs)).assign(
                _ts_us=lambda d: d["ts"].astype("int64") // NS_PER_US
            ).sort_values(["_ts_us", "event_id"])
            for ts, val in zip(rows["_ts_us"], rows["value"]):
                ts = int(ts)
                if n > 0 and ts - t1 > gap_us:
                    closed.append((user_id, s_idx, n, t0, t1, round(sv, 6)))
                    s_idx, n, t0, sv = s_idx + 1, 0, ts, 0.0
                if n == 0:
                    t0 = ts
                n += 1
                t1 = ts
                sv += float(val)
            state.update((s_idx, n, t0, t1, sv))
            if state_timeout_ms is not None:
                state.setTimeoutDuration(state_timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=[f.name for f in SESSION_SCHEMA.fields]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------------------
# running-statistics anomaly detection (stream + batch twins)
# ---------------------------------------------------------------------------

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)


def anomaly_batch(
    events: DataFrame, *, min_history: int = 5, threshold: float = 3.0
) -> DataFrame:
    """Per-event anomaly score against the user's OWN history: z-score of
    each value vs the running mean/stddev of all PRIOR events (event-time
    order): (user_id, event_id, ts_us, value, n_prior, z, is_anomaly).

    z is NULL until ``min_history`` prior events exist and the prior
    variance is positive; ``is_anomaly`` compares the ROUNDED z (the value
    emitted) so flag and score never disagree across engines.  The running
    sums Σv, Σv² come from one cumulative window frame — the same
    user-keyed Exchange+Sort every other per-user analytic here uses, and
    the formulation the streaming twin reproduces with O(1) state.
    """
    ev = events.select(
        "user_id", "event_id", ts_us("ts").alias("ts_us"), "value"
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.count(F.lit(1)).over(wp)
    s = F.sum("value").over(wp)
    ss = F.sum(F.col("value") * F.col("value")).over(wp)
    var = (ss - s * s / n) / (n - 1)
    z = F.when(
        (n >= min_history) & (var > 0),
        F.round((F.col("value") - s / n) / F.sqrt(var), 6),
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        "value",
        n.cast("long").alias("n_prior"),
        z.alias("z"),
        (F.abs(z) > threshold).alias("is_anomaly"),
    )


def anomaly_stream(
    events: DataFrame,
    *,
    min_history: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of ``anomaly_batch`` via ``applyInPandasWithState``:
    per-user GroupState holds (n, Σv, Σv²) — three numbers, never the
    history — and each arriving event is scored against the state BEFORE
    being folded in.  Same event-order accumulation as the batch window,
    so closed prefixes match the batch result exactly (stream==batch
    pytest-gated).  Ordering contract as in ``sessionize_stream``."""

    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("ss", T.DoubleType()),
        ]
    )

    def _update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        if state.exists:
            n, s, ss = state.get
        else:
            n, s, ss = 0, 0.0, 0.0
        # batch-twin fold order: (microsecond ts, event_id) — see the
        # sessionize_stream note (round-7 review fix)
        rows = pd.concat(list(pdfs)).assign(
            _ts_us=lambda d: d["ts"].astype("int64") // NS_PER_US
        ).sort_values(["_ts_us", "event_id"])
        out = []
        for eid, ts, val in zip(rows["event_id"], rows["_ts_us"], rows["value"]):
            v = float(val)
            z = None
            if n >= min_history:
                var = (ss - s * s / n) / (n - 1)
                if var > 0:
                    z = round((v - s / n) / (var ** 0.5), 6)
            out.append(
                (
                    user_id,
                    int(eid),
                    int(ts),
                    v,
                    n,
                    z,
                    (abs(z) > threshold) if z is not None else None,
                )
            )
            n, s, ss = n + 1, s + v, ss + v * v
        state.update((n, s, ss))
        yield pd.DataFrame(
            out, columns=[f.name for f in ANOMALY_SCHEMA.fields]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def upsert_sink(
    stream: DataFrame,
    path: str,
    *,
    keys: Iterable[str],
    seq_col: str,
    checkpoint: str,
    trigger_available_now: bool = False,
):
    """Materialize a keyed stream into a parquet table with MERGE semantics
    (latest ``seq_col`` per key wins) — the streaming half of the CDC story
    (sources/cdc.py): a changelog stream becomes a continuously-maintained
    current-state table.

    ``foreachBatch`` is the idiomatic Spark shape for this: each micro-
    batch runs a normal BATCH merge (read current table -> union -> keyed
    latest-wins window -> write tmp -> atomic swap; same discipline as
    sources/cdc.apply_changelog, but the table persists each key's winning
    seq so a stale row arriving in a LATER batch still loses), and the
    streaming layer adds only checkpointing + restart semantics.  Deletes
    are persisted as TOMBSTONES (``_op='D'`` rows keeping the delete's
    seq) rather than dropped: if the deleted key vanished from storage, a
    stale upsert (lower seq than the delete) redelivered or arriving in a
    later batch would resurrect it.  Serve reads through
    ``read_upsert_table`` which filters tombstones out.  foreachBatch may
    re-deliver a batch after a crash; latest-seq-wins over the persisted
    seq makes the merge IDEMPOTENT, which is exactly the exactly-once
    recipe the Structured Streaming guide prescribes for idempotent sinks.

    Scale notes: each merge shuffles current ∪ batch once on the key —
    at a 100 TB table that's a rewrite per batch, which is why real
    deployments put a table format (Delta/Iceberg/Hudi MERGE INTO, file-
    level pruning) under this exact foreachBatch pattern; the dataflow
    above the sink is unchanged.  The COMMIT, however, is real (round 5,
    VERDICT r4 item 5): each batch writes a fresh immutable data dir and
    atomically publishes a single-file manifest (sources/manifest.py) —
    a crash mid-write leaves an orphan dir no reader ever resolves, never
    a half-swapped table (crash-injection pytest-locked).
    """
    from dask_mwu_spark.sources import manifest as mf

    key_list = list(keys)

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        data_cols = [c for c in batch.columns if c not in (seq_col, "op")]
        # the stored table KEEPS the winning seq per key: a late-arriving
        # stale row (lower seq than the stored version) must lose even
        # though it arrives in a later batch — tagging the base with a
        # sentinel seq (the from-scratch replay trick) would break that
        changes = batch.select(
            *data_cols,
            F.col(seq_col).cast("long").alias("_seq"),
            (
                F.col("op") if "op" in batch.columns else F.lit("U")
            ).alias("_op"),
        )
        committed = mf.committed_data_path(path)
        if committed is not None:
            base = spark.read.parquet(committed)
        else:
            base = spark.createDataFrame([], changes.schema)
        merged = base.unionByName(changes)
        w = Window.partitionBy(*key_list).orderBy(
            F.col("_seq").desc(),
            F.when(F.col("_op") == "D", 0).otherwise(1).asc(),
        )
        # keep the per-key winner WHATEVER its op: a winning delete stays
        # in the table as a tombstone so later/redelivered stale upserts
        # compare against its seq and lose (ADVICE r3: dropping the key
        # here allowed stale-after-delete resurrection)
        current = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        data_dir = mf.new_data_dir(path, tag=f"b{batch_id}")
        current.write.mode("overwrite").parquet(data_dir)
        mf.publish_version(path, data_dir, meta={"batch_id": batch_id})
        mf.vacuum(path, keep=2)

    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_upsert_table(spark, path: str) -> DataFrame:
    """Current-state view of an ``upsert_sink`` table: resolves the last
    COMMITTED manifest (sources/manifest.py) — never a raw directory
    listing, so a concurrently-crashed writer is invisible — and filters
    out the delete tombstones (``_op='D'``) the table keeps for
    stale-late-arrival correctness.  Tombstone filtering EXCLUDES
    ``_op='D'`` rather than requiring ``_op='U'`` (round-7 review fix):
    upsert_sink passes a changelog's ``op`` column through verbatim, so a
    source using 'c'/'u'/'r' (Debezium) or 'I' persisted winners that
    the old equality filter silently hid from every read.  The predicate
    is scan-stage (parquet dictionary/stats-prunable), so the live view
    costs nothing extra at scale.  Falls back to reading ``path``
    directly for legacy flat tables that predate the manifest protocol."""
    from dask_mwu_spark.sources import manifest as mf

    committed = mf.committed_data_path(path)
    df = spark.read.parquet(committed if committed is not None else path)
    if "_op" not in df.columns:
        # legacy flat table with no op column: nothing is a tombstone
        return df
    # a NULL _op (changelog with op absent on some rows) is a live row:
    # only an explicit delete is a tombstone
    return df.where(
        F.col("_op").isNull() | (F.col("_op") != "D")
    )
