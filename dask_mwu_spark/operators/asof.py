"""As-of (most-recent-prior) join — a custom operator Spark's built-in join
set lacks, composed from existing DataFrame ops (no UDF).

Semantics: for every left row, attach the payload of the right row with the
largest timestamp <= the left row's timestamp within the same key group
(inclusive match, like DuckDB/kdb ASOF JOIN and pandas merge_asof with
direction='backward').

Implementation is the union-and-carry-forward formulation: tag both sides,
union, sort within key by (ts, side) with right rows first at equal ts, and
carry the right payload forward with last(ignorenulls=True). ONE shuffle of
|L| + |R| rows, no join node at all — where a naive approach would
range-join or per-row subquery. At 100 TB this is the same cost as any
windowed op on the union: hash by key, sort within partition, stream.

An optional ``tolerance_us`` voids matches older than the tolerance
(merge_asof semantics); matched payloads beyond it become NULL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str,
    payload_cols: Sequence[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Attach, to each ``left`` row, the most recent ``right`` payload at or
    before its ``ts`` within the same ``on`` group.

    ``left`` and ``right`` must share the ``on`` and ``ts`` columns;
    ``payload_cols`` are taken from ``right`` and emitted as
    ``asof_<name>`` plus ``asof_ts`` (the matched right timestamp, NULL if
    no match). Left columns pass through unchanged.

    Right-side duplicates at the same (on, ts) are resolved by keeping the
    LAST one in (ts) order after an internal dedup — callers needing a
    different policy should pre-aggregate the right side.
    """
    payload_cols = list(payload_cols)
    # dedup right on (key, ts): deterministic last-writer-wins via max over
    # a struct is avoided; use row_number with payload tiebreak
    wr = Window.partitionBy(on, ts).orderBy(*[F.col(c) for c in payload_cols])
    r = (
        right.select(on, ts, *payload_cols)
        .withColumn("_rn", F.row_number().over(wr))
        .withColumn(
            "_last",
            F.max("_rn").over(Window.partitionBy(on, ts)),
        )
        .where(F.col("_rn") == F.col("_last"))
        .drop("_rn", "_last")
    )

    left_cols = left.columns
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
        F.lit(None).cast(r.schema[ts].dataType).alias("_r_ts"),
    )
    r_tagged = r.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        F.col(ts).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort BEFORE left rows at equal ts -> inclusive (<=) match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    out = carried.where(F.col("_side") == 1).drop("_side")
    if tolerance_us is not None:
        stale = F.col("asof_ts").isNull() | (
            F.col(ts) - F.col("asof_ts") > tolerance_us
        )
        out = out.select(
            *left_cols,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in payload_cols
            ],
            F.when(stale, F.lit(None)).otherwise(F.col("asof_ts")).alias("asof_ts"),
        )
    return out
