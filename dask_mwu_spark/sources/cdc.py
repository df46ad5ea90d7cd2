"""Change-data-capture application: merge-upsert and changelog replay.

The ingestion half of a lakehouse: a base snapshot plus a stream of keyed
changes (upserts and deletes, ordered by a sequence number) must collapse
to the current state.  Table formats (Iceberg/Delta) do the COMMIT
bookkeeping; the actual state collapse is engine work, and this is its
Spark-first form:

    union (base tagged with sequence -inf)  →  one shuffle on the key  →
    row_number() latest-wins per key        →  drop deletes.

Scale design: exactly ONE shuffle of base+changes on the (uniform) primary
key — the minimum any merge can do; no join node at all, so there is no
build side to size and no skew-join edge case.  The per-key window sees
only that key's versions (base row + its changes), which is tiny by
construction.  This is the same union + carry-forward trick as the as-of
join (operators/asof.py) applied to mutation semantics.

No counterpart in the reference (SURVEY.md section 2.1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OP_UPSERT = "U"
OP_DELETE = "D"


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    *,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Replay a changelog onto a base snapshot: for every key keep the
    highest-``seq_col`` version (base rows rank below every change), then
    drop keys whose winning version is a delete.

    ``changes`` must carry the base columns plus ``seq_col`` (int, unique
    per key — e.g. a log offset) and ``op_col`` ('U' upsert / 'D' delete;
    delete rows may carry nulls in non-key columns).  Ties on seq within a
    key are broken by preferring the delete (the conservative reading);
    ordering is deterministic either way.
    """
    data_cols = [c for c in base.columns]
    tagged_base = base.select(
        *data_cols,
        F.lit(-1).cast("long").alias(seq_col),
        F.lit(OP_UPSERT).alias(op_col),
    )
    tagged_changes = changes.select(*data_cols, seq_col, op_col)
    merged = tagged_base.unionByName(tagged_changes)
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        # tie on seq: delete outranks upsert
        F.when(F.col(op_col) == OP_DELETE, 0).otherwise(1).asc(),
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) == OP_UPSERT))
        .select(*data_cols)
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    *,
    keys: Sequence[str],
) -> DataFrame:
    """Plain MERGE (no deletes, updates always win): replay ``updates`` as
    a single-sequence upsert batch."""
    changes = updates.select(
        *base.columns,
        F.lit(0).cast("long").alias("seq"),
        F.lit(OP_UPSERT).alias("op"),
    )
    return apply_changelog(base, changes, keys=keys)


def scd2_history(
    base: DataFrame,
    changes: DataFrame,
    *,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    base_seq: int = -1,
) -> DataFrame:
    """Slowly-changing-dimension type 2: the full version history of every
    key with validity intervals, instead of just the latest state.

    Returns the base+changes rows (deletes excluded from the output but
    closing the interval of the version they superseded) with three audit
    columns:

    - ``valid_from``: this version's own sequence number;
    - ``valid_to``: the next version's sequence number, NULL while open;
    - ``is_current``: the version is the key's live row (latest AND not
      superseded by a delete).

    Same single-shuffle discipline as :func:`apply_changelog` — union,
    one window per key ordered by seq, ``lead()`` closes intervals.  No
    join; a key's history lives in one partition's window frame, which is
    bounded by that key's change count, not the table size.

    Warehouse SCD2 merges usually run per-batch against a stored dimension
    table; this is the from-scratch (re)build — the shape backfills and
    migrations need.  Incremental per-batch maintenance is
    :func:`merge_upsert` on the ``is_current`` slice.
    """
    data_cols = list(base.columns)
    tagged_base = base.select(
        *data_cols,
        F.lit(base_seq).cast("long").alias(seq_col),
        F.lit(OP_UPSERT).alias(op_col),
    )
    merged = tagged_base.unionByName(changes.select(*data_cols, seq_col, op_col))
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).asc(),
        F.when(F.col(op_col) == OP_DELETE, 1).otherwise(0).asc(),
    )
    hist = merged.select(
        *data_cols,
        F.col(seq_col).alias("valid_from"),
        F.lead(seq_col).over(w).alias("valid_to"),
        F.col(op_col).alias("_op"),
    )
    return hist.where(F.col("_op") == OP_UPSERT).select(
        *data_cols,
        "valid_from",
        "valid_to",
        (F.col("valid_to").isNull()).alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed diff of two table snapshots — the dataset-versioning primitive
    (what changed between yesterday's and today's build; the audit before a
    publish).  Returns one row per key present in either snapshot with a
    ``diff_status`` column: 'added' (new only), 'removed' (old only),
    'changed' (both, compared columns differ), 'unchanged'.

    Comparison is by md5 over the ``compare_cols`` (default: every non-key
    column, in schema order) cast to string with a NULL sentinel, so the
    row-content check is one fixed-width digest compare, not N column
    equality predicates over wide rows.

    Scale: one full-outer sort-merge/hash join on the (uniform) primary
    key — the minimum for an unordered diff; both sides aggregate nothing
    and shuffle exactly once.  When both snapshots are bucket-stored on
    the key (``sources/bucketed.write_bucketed_table``) even that shuffle
    disappears.  The digest is computed BEFORE the join, so wide payload
    columns never travel through the join — just keys + 32-char digests.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]

    def digested(df: DataFrame, tag: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in compare_cols
        ]
        return df.select(
            *keys, F.md5(F.concat_ws("\x01", *parts)).alias(f"_h_{tag}")
        )

    o, n = digested(old, "old"), digested(new, "new")
    joined = o.join(n, on=list(keys), how="full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*keys, status.alias("diff_status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    *,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Count rows per ``diff_status`` — the one-line publish gate
    ("+1,204 / -3 / ~89 rows vs yesterday")."""
    return (
        snapshot_diff(old, new, keys=keys, compare_cols=compare_cols)
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
