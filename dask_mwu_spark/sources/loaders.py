"""Sources: parquet loaders and wide-to-long melters.

The reference loads a chunked dense zarr matrix (reference:
scratch/rank_gene_groups.py:112) plus parquet obs/vars metadata (:116,:127).
Parquet *is* our chunked columnar store — ``spark.read.parquet`` gives lazy,
column-pruned, predicate-pushed scans, so sources S1-S3 of SURVEY.md section 2
collapse into these helpers.

``melt`` turns k wide numeric columns into the long ``(feature, value)``
encoding with a single narrow projection + ``explode`` of a k-element struct
array: no shuffle, no UDF, survives any scale (it is a flatMap in the scan
stage and whole-stage-codegen'd).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    fan_out: bool | str = False,
) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md).

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark rejects unless
    the nanosAsLong legacy conf is on — set it here (runtime-settable) so the
    loaders work under any caller-provided SparkSession, not just ours.

    ``fan_out``: parquet scan parallelism is bounded by ROW GROUPS, not byte
    splits — a single-row-group file (like this testdata, and like plenty of
    real-world exports) pins the scan + downstream narrow chain (melt,
    partial aggregation) to ONE task no matter how many executors exist
    (Spark still REPORTS many partitions for a big file — they're empty
    byte-range splits; see the repartition comment below).
    ``fan_out=True`` inserts a round-robin repartition after such a scan so
    later stages run at full width.  Off by default, and the decision
    variable is downstream COMPUTE-PER-BYTE, not row count
    (tools/scale_probe_fanout.py, 20M-row one-row-group file, local[32]):
    a cheap melt+sum chain is 5x FASTER single-task than behind the
    fan-out shuffle (5.4s vs 25.8s — the single producer pays the shuffle
    write either way), while a hashing-heavy chain (md5 per cell, the
    text/dedup operator shape) is 6.5x SLOWER single-task (225s vs 35s).
    Turn it on when the per-row work after the scan clearly outweighs one
    raw-row shuffle; with multi-row-group inputs it's moot.

    ``fan_out="auto"`` (optimization r12) gates the same repartition on the
    file's ACTUAL row-group parallelism, read from the parquet footers
    driver-side (bounded metadata work — the scan planner reads the same
    footers): the repartition is inserted only when the file set carries
    fewer row groups than ``defaultParallelism``.  A production-scale input
    (thousands of row groups) therefore never pays the extra shuffle and
    keeps scan-stage filter pushdown intact, while a row-group-deficient
    export stops serializing the whole narrow pipeline onto one core.  This
    is the scale-adaptive form the optimization guide asks for (§2: derive
    partitioning from the input, don't pin it to either regime).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events":
        df = _normalize_event_ts(spark, df)
    if fan_out == "auto":
        fan_out = _row_groups(path) < spark.sparkContext.defaultParallelism
    if fan_out:
        # UNCONDITIONAL repartition: getNumPartitions() cannot gate this —
        # Spark byte-splits a big single-row-group file into many scan
        # partitions, but only the split containing the row-group start
        # emits rows, so the partition COUNT looks wide while the actual
        # row production is one task (measured in
        # tools/scale_probe_fanout.py: a 100M-cell hash chain ran 1-task
        # at "32 partitions").  The caller opted into one raw-row shuffle;
        # give it to them.
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


# parquet footer row-group counts per path — driver-side metadata cached for
# the process lifetime (the files are immutable inputs; re-reading footers
# per query construction would add driver latency for no information)
_ROW_GROUP_CACHE: dict[str, int] = {}

# stop counting once a file set provably carries enough row groups for any
# realistic core count — keeps the footer walk bounded on huge tables
_ROW_GROUP_ENOUGH = 4096


def _row_groups(path: str) -> int:
    """Total parquet row groups under ``path`` (file or directory), capped
    at ``_ROW_GROUP_ENOUGH``: the ``fan_out="auto"`` gate only needs to
    know whether the count clears ``defaultParallelism``, so the walk exits
    early on well-laid-out tables instead of reading every footer."""
    cached = _ROW_GROUP_CACHE.get(path)
    if cached is not None:
        return cached
    import os

    import pyarrow.parquet as pq

    def _one(p: str) -> int:
        try:
            return pq.ParquetFile(p).num_row_groups
        except Exception:
            # unreadable footer (not a data file): claim plenty so the
            # auto gate stays a no-op rather than forcing a shuffle
            return _ROW_GROUP_ENOUGH

    if os.path.isdir(path):
        total = 0
        for entry in sorted(os.listdir(path)):
            if not entry.endswith(".parquet"):
                continue
            total += _one(os.path.join(path, entry))
            if total >= _ROW_GROUP_ENOUGH:
                break
    else:
        total = _one(path)
    _ROW_GROUP_CACHE[path] = total
    return total


def _normalize_event_ts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to epoch-nanos BIGINT whatever the file stores.

    The generated testdata has shipped ``ts`` as TIMESTAMP(NANOS) (read as
    BIGINT nanos under the nanosAsLong legacy conf) in one round and as
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) in another.  Downstream
    operators and every DuckDB oracle (``epoch_ns(ts)`` / ``epoch_us(ts)``,
    naive-as-UTC) assume epoch-nanos BIGINT, so the loader is the single
    normalization point:

    - BIGINT: already epoch nanos — unchanged.
    - TIMESTAMP (LTZ, parquet isAdjustedToUTC=true): ``unix_micros(ts)`` is
      instant-based — it returns the stored int64 micros whatever the
      session timezone.
    - TIMESTAMP_NTZ: the naive value must be read as UTC wall time to match
      DuckDB's naive-as-UTC ``epoch_us`` bit-for-bit.  Rebuild the instant
      field-by-field with ``make_timestamp(..., 'UTC')`` — the zone is IN
      the expression, so no session-conf dependence (the previous
      implementation set ``spark.sql.session.timeZone=UTC`` as a load-time
      side effect, silently changing timestamp semantics for every other
      query in the session; ADVICE r3).  ``extract(second)`` is
      DECIMAL(8,6): micros survive exactly, and ``unix_micros`` keeps the
      whole path integer-exact.  Micros→nanos multiply stays well inside
      BIGINT range either way.

    Scan-stage projection — no shuffle, no UDF, and parquet min/max stats on
    the raw column still prune row groups for pushed-down filters on other
    columns.
    """
    (dtype,) = [t for c, t in df.dtypes if c == "ts"]
    if dtype == "bigint":
        return df
    if dtype == "timestamp":
        us = F.unix_micros(F.col("ts"))
    else:
        us = F.expr(
            "unix_micros(make_timestamp(year(ts), month(ts), day(ts), "
            "hour(ts), minute(ts), extract(second from ts), 'UTC'))"
        )
    cols = [
        (us * F.lit(1000)).alias(c) if c == "ts" else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def melt(
    df: DataFrame,
    id_cols: Sequence[str | Column],
    value_cols: Sequence[str],
    *,
    feature_col: str = "feature",
    value_col: str = "value",
) -> DataFrame:
    """Wide → long: one output row per (input row, value column).

    Shuffle-free: `inline(array(struct...))` expands rows inside the scan
    stage, so Catalyst still pushes filters on id columns down to parquet.
    """
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias(feature_col),
                F.col(c).cast("double").alias(value_col),
            )
            for c in value_cols
        ]
    )
    ids = [F.col(c) if isinstance(c, str) else c for c in id_cols]
    return df.select(*ids, F.inline(structs))


LINEITEM_FEATURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def obs_measure_from_lineitem(
    spark: SparkSession,
    sf_dir: str,
    *,
    group_col: str = "l_returnflag",
    features: Sequence[str] = LINEITEM_FEATURES,
    log1p: bool = False,
) -> DataFrame:
    """lineitem → long obs/measure table ``(obs_id, group, feature, value)``.

    obs_id is (l_orderkey, l_linenumber) packed into one BIGINT — unique per
    line item, computed without any shuffle (vs. a window-based dense rank,
    which would need a global sort).  FIXTURES.md F5 mapping.

    ``log1p=True`` applies the log1p normalization the reference's data model
    assumes (its LFC de-logs means with expm1, logfoldchange.py:48): rank
    statistics are invariant under the monotonic transform, and LFC becomes
    finite for large-magnitude measures like l_extendedprice.
    """
    li = load_table(spark, sf_dir, "lineitem")
    obs_id = (F.col("l_orderkey") * F.lit(8) + F.col("l_linenumber")).alias("obs_id")
    out = melt(
        li,
        [obs_id, F.col(group_col).alias("group")],
        list(features),
    )
    if log1p:
        out = out.withColumn("value", F.log1p("value"))
    return out


def events_with_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with the ``props`` JSON column parsed into a typed struct
    (``from_json`` with an explicit schema — Catalyst-native JSON path, no
    Python; malformed rows become NULL structs, the PERMISSIVE default)."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return ev.withColumn("props_s", F.from_json("props", schema))


def obs_measure_from_events(
    spark: SparkSession,
    sf_dir: str,
    *,
    group_col: str = "event_type",
) -> DataFrame:
    """events → long obs/measure table with the single feature ``value``."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("obs_id"),
        F.col(group_col).alias("group"),
        F.lit("value").alias("feature"),
        F.col("value").cast("double").alias("value"),
    )
