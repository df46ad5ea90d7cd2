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
