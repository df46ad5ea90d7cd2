"""Range (interval-containment) join — the second custom join Spark's
built-in set lacks (alongside as-of), composed from existing DataFrame ops.

Problem: join fact rows to the interval(s) [lo, hi) containing their value.
Spark plans a plain ``f.value >= i.lo AND f.value < i.hi`` join as
BroadcastNestedLoopJoin — O(|facts| x |intervals|) comparisons, fatal at
100 TB whenever the interval side is too big to braodcast-and-scan cheaply.

Scale path: quantize the value domain into fixed-width buckets; explode
each interval into the buckets it covers; bucket each fact row; equi-join
on the bucket id (hash join, shuffle only on bucket); filter the exact
containment predicate. Cost is |facts| + sum(interval widths)/bucket_width
join rows — linear, with the bucket width as the fan-out dial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(c: Column, width: float) -> Column:
    return F.floor(c / F.lit(width)).cast("long")


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every interval with lo <= value < hi.

    ``facts`` keeps all its columns; ``intervals``' columns are appended.
    ``bucket_width`` should be on the order of the typical interval width:
    too small explodes the interval side, too large degrades pruning
    (every bucket-collision still passes through the exact filter, so the
    result is identical either way — only the join volume changes).

    ``how='left'`` keeps unmatched facts with NULL interval columns.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"range_join supports inner/left, not {how!r}")
    iv_cols = intervals.columns
    # explode intervals into covering buckets: floor(lo/w) .. floor((hi-ulp)/w);
    # hi is exclusive, so an interval ending exactly on a bucket boundary
    # does not claim the next bucket
    exploded = intervals.select(
        *iv_cols,
        F.explode(
            F.sequence(
                _bucket(F.col(lo_col), bucket_width),
                _bucket(
                    F.col(hi_col) - F.lit(1e-9) * F.lit(bucket_width), bucket_width
                ),
            )
        ).alias("_bucket"),
    )
    bucketed = facts.withColumn("_bucket", _bucket(F.col(value_col), bucket_width))
    contained = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    if how == "inner":
        return (
            bucketed.join(exploded, on="_bucket")
            .where(contained)
            .drop("_bucket")
        )
    # left: inner-match then re-attach the unmatched facts
    matched = bucketed.join(exploded, on="_bucket").where(contained).drop("_bucket")
    unmatched = facts.join(
        matched.select(*facts.columns).distinct(), on=facts.columns, how="left_anti"
    )
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType)
        )
    return matched.unionByName(unmatched)
