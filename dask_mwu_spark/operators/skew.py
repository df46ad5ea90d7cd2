"""Skew mitigation: salted joins and two-phase aggregation.

At 100 TB a single hot key (one pathological feature value, one spam user,
one empty-string document) lands an entire shuffle partition on one task.
AQE's skew-join splitting (on in the session factory) handles most
sort-merge cases at runtime; these operators are the explicit, plannable
fallback for when the skew is known ahead of time or the join shape AQE
cannot split (e.g. aggregation hot keys, broadcast-ineligible dimension
sides).

- ``salted_join``: salt the skewed (large) side with a deterministic
  per-row salt, replicate the small side once per salt, join on
  (key, salt) — the hot key's rows spread over ``n_salts`` tasks. Result
  is row-identical to the plain join (verified in tests).
- ``two_phase_agg``: pre-aggregate on (key, salt), then finish on key.
  For algebraic aggregates Spark's map-side partial aggregation already
  does this implicitly; the explicit form exists for aggregation over
  ALREADY-SHUFFLED inputs (e.g. after a window) where no partial stage
  exists, and as the building block for custom combiners.

The reference has no counterpart (single-node-memory dataflow); this is
engine-level capability the Spark port adds (SURVEY.md section 2.1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: hash of every column — uniform, stable
    across retries/partitionings (no rand(), which would break retry
    idempotency and cross-run determinism)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s join keys are heavily skewed and
    ``small`` is too large to broadcast: spreads each hot key across
    ``n_salts`` tasks at the cost of replicating ``small`` n_salts times.

    Join-key columns are kept from the skewed side; all other columns of
    both inputs pass through (same surface as ``skewed.join(small, on)``).

    Only left-oriented joins are valid: a right/full outer join would emit
    each unmatched ``small`` row once PER SALT replica.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi",
                   "left_semi", "leftanti", "left_anti", "cross"):
        raise ValueError(
            f"salted_join supports inner/left-oriented joins, not {how!r}: "
            "right/full outer would duplicate unmatched small-side rows "
            "once per salt replica"
        )
    on = list(on)
    salted_l = skewed.withColumn("_salt", _salt_col(skewed, n_salts))
    replicated_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return salted_l.join(replicated_r, on=on + ["_salt"], how=how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    *,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: phase 1 aggregates
    (keys, salt) — the hot key's rows split over n_salts reducers — phase 2
    merges the per-salt partials. ``aggs`` maps column -> {sum,count,min,max}
    (the algebraic aggregates that decompose; count merges by sum).
    """
    keys = list(keys)
    phase1 = [getattr(F, fn)(c).alias(f"_{fn}_{c}") for c, fn in aggs.items()]
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    phase2 = [
        getattr(F, merge_fn[fn])(f"_{fn}_{c}").alias(f"{fn}_{c}")
        for c, fn in aggs.items()
    ]
    salted = df.withColumn("_salt", _salt_col(df, n_salts))
    return salted.groupBy(*keys, "_salt").agg(*phase1).groupBy(*keys).agg(*phase2)
