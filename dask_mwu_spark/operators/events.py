"""Batch event-analytics operators: ordered funnels and cohort retention.

No counterpart in the reference (SURVEY.md section 2.1) — product-analytics
primitives every event pipeline ships, built from joins and aggregations on
the uniform ``user_id`` key.

Scale design:
- Funnel: one filtered min-ts aggregation per step plus an equi-join on
  user_id between consecutive steps.  Each step's table only SHRINKS
  (users who reached the step), the join key is the uniform user id, and
  the filters push into the shared scan.  No windows over the event
  stream, no per-user sorting — the classic "sort each user's events"
  formulation dies on power users; min-ts chaining doesn't.
- Cohort retention: two aggregations keyed by user_id / (cohort, offset).
  Day indexing is pure integer arithmetic on the raw epoch (no calendar
  functions), so the result is timezone-free and engine-portable.

The events table stores TIMESTAMP(NANOS), which ``load_table`` surfaces as
a BIGINT of nanoseconds — all time math here is integer math on that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NS_PER_DAY = 86_400_000_000_000


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: (step, step_name, n_users) where a user
    counts for step i iff they produced ``steps[i]`` at-or-after their
    earliest qualifying time for step i-1 (min-ts chaining; ties allowed,
    matching the usual at-least-once semantics).

    Step tables are monotonically shrinking user sets; each transition is
    one filtered aggregation + one uniform equi-join.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    counts = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = events.where(F.col(type_col) == step)
        if prev is None:
            stage = ev.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        else:
            stage = (
                ev.join(prev.select(user_col, F.col("_t").alias("_prev_t")), on=user_col)
                .where(F.col(ts_col) >= F.col("_prev_t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        counts.append(
            stage.agg(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(step).alias("step_name"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        prev = stage
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-grain cohort retention: (cohort_day, day_offset, n_users) =
    users whose FIRST event fell on ``cohort_day`` (epoch-day integer) and
    who were active ``day_offset`` days later.  Integer epoch math only —
    timezone-free, calendar-free, engine-portable.
    """
    # integer `div`, NOT `/`: a 2024 epoch-nanos value (~1.7e18) exceeds
    # double's 53-bit exact-integer range, so float division can misplace
    # events at day boundaries; `div` stays in long arithmetic
    day = F.expr(f"{ts_col} div {NS_PER_DAY}")
    active = events.select(
        F.col(user_col).alias("u"), day.alias("day")
    ).distinct()
    first = active.groupBy("u").agg(F.min("day").alias("cohort_day"))
    return (
        active.join(first, on="u")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


NS_PER_HOUR = 3_600_000_000_000


def resample_events(
    events: DataFrame,
    *,
    bucket_ns: int = NS_PER_HOUR,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user fixed-interval resampling with GAP FILL and forward fill:
    (user_id, bucket, n_events, sum_value, filled_value).

    Downsamples the event stream to ``bucket_ns``-wide intervals, emits a
    row for EVERY bucket between each user's first and last event (gaps
    get n_events = 0), and carries the last observed per-bucket sum
    forward across gaps — the resample → ffill primitive time-series
    stores ship (and the feature-engineering shape "activity per hour,
    zero-filled" a training pipeline needs).

    Engine mechanics: bucket index is integer `div` on the raw epoch-nanos
    (timezone-free, exact — see cohort_retention); the dense grid is a
    per-user ``sequence()`` explode (generator in the scan stage, no
    shuffle) bounded by each user's own span, NOT a global calendar cross
    join; the fill is one ``last(ignorenulls)`` running window per user.
    Scale: grid size is Σ_u span_u/bucket — linear in users × span; the
    join key (user, bucket) is uniform, and a power user costs its span,
    never its event count squared.
    """
    b = F.expr(f"{ts_col} div {bucket_ns}").alias("bucket")
    per_bucket = (
        events.select(F.col(user_col).alias("user_id"), b, F.col(value_col))
        .groupBy("user_id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
    )
    grid = (
        per_bucket.groupBy("user_id")
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket"),
        )
    )
    joined = grid.join(per_bucket, ["user_id", "bucket"], "left").na.fill(
        {"n_events": 0}
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        "n_events",
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
    )


def user_event_sequences(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_len: int = 32,
) -> DataFrame:
    """Per-user ordered action sequences — the construction step for
    sequence-model training data (next-event prediction, session LMs) and
    for behavioral features: ``(user_id, n_events, seq)`` where ``seq`` is
    the first ``max_len`` event types in (ts, event_id) order joined with
    '>'.

    Spark-first: sort_array over collected (ts, id, type) structs — the
    struct sorts lexicographically (ts first, id tiebreak), so ordering is
    deterministic under any partitioning; slice + array_join truncate and
    render JVM-side.  ONE shuffle on the (uniform) user key; per-user state
    is the user's event count, and the output row is clipped to max_len —
    a power user costs their event count in the aggregation, never more.

    At 100 TB: this is the canonical groupBy-heavy shape; the collected
    struct carries only (ts, id, type) — project before calling if events
    has wide payloads, so the shuffle moves 3 columns, not the row.
    """
    packed = F.struct(
        F.col(ts_col).alias("ts"), F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
    )
    return (
        events.select(F.col(user_col).alias("user_id"), packed.alias("_e"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.slice(
                    F.transform(
                        F.sort_array(F.collect_list("_e")), lambda s: s["etype"]
                    ),
                    1,
                    max_len,
                ),
                ">",
            ).alias("seq"),
        )
    )


def path_ngrams(
    events: DataFrame,
    *,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common n-step user paths — the path-analysis staple
    ("view>click>purchase happens 12k times"):
    ``(path, n_occurrences)``, top-k by count.

    lead() windows over each user's (ts, id)-ordered events build the
    n-grams in place (same single window sort the sessionizer pays; the
    user key is uniform), one map-side-combinable count per distinct path
    (path cardinality <= |event types|^n — tiny), and the head is
    ``orderBy().limit(k)`` = TakeOrderedAndProject.  No collect, no
    global sort, no self-join.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    paths = (
        events.select(
            F.concat_ws(">", *parts).alias("path"),
            F.lead(type_col, n - 1).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return paths.orderBy(
        F.col("n_occurrences").desc(), F.col("path")
    ).limit(k)


def window_dedup_events(
    events: DataFrame,
    *,
    window_ns: int = 300_000_000_000,  # 5 minutes
    keys: Sequence[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch twin of the streaming dedup (streaming/events.dedup_stream):
    within each tumbling ``window_ns`` bucket, keep only the FIRST event
    per key (earliest ts, ties broken by the id column) — the
    at-least-once-delivery scrub every event pipeline runs.  Adds a
    ``win`` column (integer bucket index, pure ns arithmetic — tz-free).

    Scale: one shuffle keyed by (keys…, win) — uniform user-keyed traffic;
    each window frame holds one key's events inside one bucket, bounded by
    the duplicate horizon exactly like the stream's watermark state."""
    # integer `div`, NOT float division: epoch-nanos (~1.7e18) exceed a
    # double's 53-bit mantissa, so / then cast can mis-bucket boundary rows
    win = F.expr(f"{ts_col} div {window_ns}L").alias("win")
    w = Window.partitionBy(*keys, "win").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        events.withColumn("win", win)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def rolling_distinct_users(
    events: DataFrame,
    *,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Rolling ``window_days``-day distinct active users (the product
    "rolling WAU/DAU" metric): for every observed day d, the count of
    distinct users with at least one event in [d-window_days+1, d].

    Sliding-window DISTINCT does not decompose into per-day partials
    (distinct is not sum-mergeable), so the classic scalable formulation
    is contribution expansion: collapse to distinct (user, day) FIRST —
    the big shrink, one map-side-combinable aggregation — then explode
    each of those rows into the <= ``window_days`` window-end days it
    contributes to and count distinct users per window end.  Fanout is
    bounded by window_days on the ALREADY-deduplicated table, day keys
    are uniform, and no per-user event ordering is ever needed.  Window
    ends with no real events in range are absent (they'd need a day
    spine); ends are clipped to the observed [min_day, max_day] so every
    emitted row is a fully-formed calendar day.  Day indexing is integer
    division on the epoch-nanos BIGINT — timezone-free.
    """
    # integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed a double's 2^53
    # exact-integer range, so float division mis-buckets day boundaries
    days = (
        events.select(
            F.col(user_col).alias("user"),
            F.expr(f"{ts_col} div {NS_PER_DAY}L").alias("day"),
        )
        .distinct()
    )
    rng = days.agg(
        F.min("day").alias("_min_day"), F.max("day").alias("_max_day")
    )
    offs = F.array(*[F.lit(i) for i in range(window_days)])
    return (
        days.select("user", "day", F.explode(offs).alias("_off"))
        .select("user", (F.col("day") + F.col("_off")).alias("window_end"))
        .crossJoin(F.broadcast(rng))
        .where(
            (F.col("window_end") >= F.col("_min_day"))
            & (F.col("window_end") <= F.col("_max_day"))
        )
        .groupBy("window_end")
        .agg(F.countDistinct("user").alias("n_active_users"))
    )


def event_type_cooccurrence(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-type co-occurrence with lift (basket analysis over the user
    dimension): for every unordered type pair, how many users did both,
    and the lift ``n_both * n_users / (n_a * n_b)`` (>1 = the types
    attract, <1 = they repel).

    Scale: collapse to distinct (user, type) first — the event volume
    never self-joins; the pair join fans each user out by C(t, 2) where
    t <= |type vocabulary| (tiny by construction), and per-type /
    per-pair counts are map-side-combinable.  Lift is a single division
    of exact BIGINT counts, rounded to 6.
    """
    ut = events.select(
        F.col(user_col).alias("user"), F.col(type_col).alias("etype")
    ).distinct()
    n_users = ut.select(
        F.countDistinct("user").alias("n_users")
    )
    per_type = ut.groupBy("etype").agg(F.count(F.lit(1)).alias("n_t"))
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "user")
        .where(F.col("a.etype") < F.col("b.etype"))
        .groupBy(
            F.col("a.etype").alias("type_a"), F.col("b.etype").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = per_type.select(
        F.col("etype").alias("type_a"), F.col("n_t").alias("n_a")
    )
    nb = per_type.select(
        F.col("etype").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def markov_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    ``(from_type, to_type, n_transitions, n_from, p)`` where ``p`` is the
    row-normalized transition probability n_transitions / n_from — the
    behavioral model behind next-action prediction baselines, funnel
    leak detection (mass flowing to an unexpected to_type), and sequence
    sanity checks on training data.  All counts are exact BIGINTs and
    ``p`` is one division, so the result is engine- and
    partitioning-deterministic with no float folding needed.

    Scale: ONE shuffle on the (uniform) user key for the lead() window —
    per-user state is that user's event count, same shape as
    ``path_ngrams``; the transition table is bounded by |type vocab|²,
    so the two count aggregations and the normalizing join are
    negligible.  Project before calling if events carries wide payloads.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            F.col(type_col).alias("from_type"),
        )
        .withColumn(
            "to_type",
            F.lead("from_type").over(
                Window.partitionBy("_u").orderBy("_ts", "_id")
            ),
        )
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("n_from")
    )
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "n_from",
        F.round(
            F.col("n_transitions").cast("double") / F.col("n_from"), 6
        ).alias("p"),
    )


def ab_test(events: DataFrame) -> DataFrame:
    """Per-event-type two-proportion z-test over a deterministic 50/50
    hash split of the user base — (event_type, n_a, n_b, x_a, x_b, p_a,
    p_b, z, p_value).  Arm = md5(user_id) % 2 (retry-stable, no rand()),
    conversion = the user emitted >= 1 event of that type, pooled-variance
    z with a two-sided normal p-value — the standard experiment readout;
    run against a PRE-experiment window it doubles as the A/A sanity
    check (every p should be well above alpha).

    Scale: the user->arm table derives from ONE distinct over user keys;
    per-type converted-user counts are a distinct + map-side-combinable
    groupBy on the (type, arm) key; arm sizes are a 2-row broadcast.
    Everything downstream is arithmetic on an n_types-row table, where
    the one Python boundary (the Arrow-batched erfc UDF, the exact
    mwu-pipeline seam) costs nothing.

    Cross-engine: counts are exact BIGINTs; z's division tree is written
    identically on both engines (IEEE /,*,sqrt are correctly rounded, so
    z is bit-identical pre-round); math.erfc vs the oracle's pure-SQL
    erfc agree to ~2e-15, absorbed by rounding p to 6 (the
    mwu_full_rounded contract).  No counterpart in the reference
    (SURVEY.md section 2.1).
    """
    from dask_mwu_spark.functions.hashing import md5_long
    from dask_mwu_spark.functions.stats import two_sided_p_from_z

    arms = (
        events.select("user_id")
        .distinct()
        .withColumn(
            "arm", F.pmod(md5_long(F.col("user_id").cast("string")), F.lit(2))
        )
    )
    sizes = arms.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
    )
    conv = (
        events.select("event_type", "user_id")
        .distinct()
        .join(arms, "user_id")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("x_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("x_b"),
        )
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.col("x_a").cast("double") / na
    pb = F.col("x_b").cast("double") / nb
    pp = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when(se > 0, (pa - pb) / se)
    return conv.crossJoin(F.broadcast(sizes)).select(
        "event_type",
        "n_a",
        "n_b",
        "x_a",
        "x_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(z, 6).alias("z"),
        F.round(two_sided_p_from_z(F.abs(z)), 6).alias("p_value"),
    )


def first_touch_attribution(
    events: DataFrame, *, conversion_type: str = "purchase"
) -> DataFrame:
    """First-touch conversion attribution: every user's FIRST event type
    (by (ts, event_id) — deterministic under ties) credited with whether
    the user ever converted — (first_touch, n_users, n_converted,
    conv_rate).  The acquisition-channel readout: which entry action
    leads to converting users, the complement of ``funnel``'s
    fixed-sequence view.

    Scale: the per-user first event is ONE map-side-combinable
    ``min(struct(ts, event_id, type))`` — no per-user sort, no window;
    converted users are a distinct over the (small) conversion slice; the
    final join keys on user and the rollup on the few-valued type.

    Cross-engine: nanos timestamps are exact BIGINTs, the min-struct
    tiebreak is total (event_id unique), conv_rate = exact-integer ratio
    rounded to 6.  No counterpart in the reference (SURVEY.md
    section 2.1).
    """
    firsts = (
        events.select(
            "user_id", F.struct("ts", "event_id", "event_type").alias("_e")
        )
        .groupBy("user_id")
        .agg(F.min("_e").alias("_f"))
        .select("user_id", F.col("_f.event_type").alias("first_touch"))
    )
    conv = (
        events.where(F.col("event_type") == conversion_type)
        .select("user_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    return (
        firsts.join(conv, "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("long").alias(
                "n_converted"
            ),
        )
        .select(
            "first_touch",
            "n_users",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double") / F.col("n_users"), 6
            ).alias("conv_rate"),
        )
    )


def inter_event_gaps(events: DataFrame) -> DataFrame:
    """Per-type inter-arrival profile: gaps between a user's consecutive
    events of the SAME type — (event_type, n_gaps, mean_gap_s, min_gap_s,
    max_gap_s).  The cadence audit behind sessionization windows, rate
    alerting, and bot detection (machine traffic shows near-constant
    sub-second gaps; organic use is heavy-tailed).

    Scale: ONE window pass partitioned on the (user, type) key — per-user
    state, never a global sort; the rollup is a map-side-combinable
    groupBy on the type vocabulary.

    Cross-engine: nanos timestamps subtract as exact BIGINTs; min/max are
    exact; the mean divides two exact integers (then by 1e9), each
    division rounded to 6.  No counterpart in the reference (SURVEY.md
    section 2.1).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("_prev", F.lag("ts").over(w))
        .where(F.col("_prev").isNotNull())
        .select("event_type", (F.col("ts") - F.col("_prev")).alias("gap_ns"))
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.sum("gap_ns").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1.0e9),
            6,
        ).alias("mean_gap_s"),
        F.round(F.min("gap_ns").cast("double") / F.lit(1.0e9), 6).alias(
            "min_gap_s"
        ),
        F.round(F.max("gap_ns").cast("double") / F.lit(1.0e9), 6).alias(
            "max_gap_s"
        ),
    )


def time_to_convert(
    events: DataFrame,
    *,
    start_type: str = "signup",
    end_type: str = "purchase",
) -> DataFrame:
    """Activation latency: per user, first ``start_type`` to first
    ``end_type`` (only when the conversion follows the start) — ONE
    summary row (n_started, n_converted, conv_rate, mean_s, min_s,
    max_s).  The onboarding-health number product teams watch weekly;
    pairs with ``first_touch_attribution`` (who converts) by answering
    how fast.

    Scale: two filtered min-aggregates on the user key (combinable, no
    windows), one 1-row rollup.  Cross-engine: nanos are exact BIGINTs;
    mean divides exact integers; each edge division rounded to 6.  No
    counterpart in the reference (SURVEY.md section 2.1).
    """
    firsts = (
        events.where(F.col("event_type").isin(start_type, end_type))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == start_type, F.col("ts"))
            ).alias("t0"),
            F.min(
                F.when(F.col("event_type") == end_type, F.col("ts"))
            ).alias("t1"),
        )
        .where(F.col("t0").isNotNull())
    )
    lat = firsts.select(
        "user_id",
        F.when(
            F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")),
            F.col("t1") - F.col("t0"),
        ).alias("lat_ns"),
    )
    return lat.groupBy().agg(
        F.count(F.lit(1)).alias("n_started"),
        F.count("lat_ns").alias("n_converted"),
        F.round(
            F.count("lat_ns").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("conv_rate"),
        F.round(
            F.sum("lat_ns").cast("double")
            / F.count("lat_ns").cast("double")
            / F.lit(1.0e9),
            6,
        ).alias("mean_s"),
        F.round(F.min("lat_ns").cast("double") / F.lit(1.0e9), 6).alias("min_s"),
        F.round(F.max("lat_ns").cast("double") / F.lit(1.0e9), 6).alias("max_s"),
    )


def session_stats(
    events: DataFrame, *, gap_s: int = 1800
) -> DataFrame:
    """Corpus-level sessionization summary — ONE row (n_sessions,
    n_users, mean_events, mean_duration_s, max_duration_s): a new session
    starts when a user's gap exceeds ``gap_s`` (the 30-min industry
    default).  The engagement denominator every product metric divides
    by; the batch twin of the streaming ``sessionize`` sink, run here
    over history for backfills and A/B readouts.

    Scale: one (user)-partitioned window pass marks session starts (lag +
    flag), a running SUM over the same partition numbers the sessions —
    both stay in the per-user sort, no global ordering anywhere; the
    per-session rollup keys on (user, session_no), the final 1-row
    aggregate is combinable.

    Cross-engine: nanos are exact BIGINTs; session numbering is an exact
    integer cumulative sum; means divide exact integers, rounded at the
    edge.  No counterpart in the reference (SURVEY.md section 2.1).
    """
    gap_ns = int(gap_s) * 1_000_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select("user_id", "ts", "event_id").withColumn(
        "_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > gap_ns),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "_sess",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = numbered.groupBy("user_id", "_sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts") - F.min("ts")).alias("dur_ns"),
    )
    return per_session.groupBy().agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_events"),
        F.round(
            F.sum("dur_ns").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1.0e9),
            6,
        ).alias("mean_duration_s"),
        F.round(F.max("dur_ns").cast("double") / F.lit(1.0e9), 6).alias(
            "max_duration_s"
        ),
    )


def power_users(events: DataFrame, *, k: int = 10) -> DataFrame:
    """Top-``k`` users by event volume with their share of ALL activity —
    (user_id, n_events, share, cum_share).  The user-concentration audit
    (pairs with the revenue HHI): a handful of users carrying most of the
    traffic means bot suspects, load-test residue, or a key-account
    dependency — either way the next question is always "who are they".

    Scale: one combinable user-key groupBy; the head is an orderBy+limit
    (TakeOrderedAndProject — per-partition heads, never a global sort);
    shares divide by a 1-row broadcast total; the cumulative share is a
    window over the <=k-row post-limit head (the bounded-window
    precedent).

    Cross-engine: counts exact; share = exact-integer ratio rounded to 6;
    cum_share sums the ROUNDED shares in rank order over the k-row head,
    rounded again.  No counterpart in the reference (SURVEY.md
    section 2.1).
    """
    per_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    total = per_user.agg(F.sum("n_events").alias("_total"))
    head = (
        per_user.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(k)
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            F.round(
                F.col("n_events").cast("double") / F.col("_total"), 6
            ).alias("share"),
        )
    )
    w = (
        Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return head.withColumn("cum_share", F.round(F.sum("share").over(w), 6))
