"""Distributed Bloom-filter pre-join pruning.

No reference counterpart (the reference is single-dataset, SURVEY.md §2.1);
this is the classic big-data pattern for joining a huge fact table against a
selective key set: build a compact bit table over the keys, broadcast it, and
drop non-matching fact rows IN THE SCAN STAGE — before they ever reach the
join shuffle.  At 100 TB this is the difference between shuffling the whole
fact table and shuffling only the (tiny) matching fraction plus a bounded
false-positive residue; the exact join afterwards removes the residue, so
composed results are EXACTLY the plain join's.

Spark itself injects runtime bloom filters for this shape
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default, with a
10 GB application-side scan threshold so it only triggers at real scale —
see tests/test_bloom.py for a forced-injection plan assertion).  This module
exists for the shapes the optimizer can't see: pruning against a PERSISTED
key index from a previous run (cross-job), pruning before an aggregation
rather than a join, or pruning with a filter small enough to store next to
the data.  Everything is md5-family hashing (functions/hashing.py) — fully
deterministic and exactly reproducible in DuckDB SQL, so the oracle checks
the filter bit-for-bit, not just the composed join result.

Design
- ``m_bits`` bits stored as ``ceil(m/63)`` BIGINT words using bits 0..62
  only — the sign bit is never set, sidestepping engine-specific semantics
  of ``1 << 63`` overflow.
- k=5 positions per key from the universal-hash family over the md5 digest
  (independent (a,b) pairs).  False-positive rate ≈ (1 - e^(-kn/m))^k:
  n=1e6 keys at the default m=2^20·63 ≈ 6.6e7 bits gives ~2e-6.  Past
  ~1e7 keys the default saturates (FPR → 1 and the pre-join prunes
  nothing — still exact, just wasted work): size ``m_bits ≈ 10·n`` or
  more for the key count you expect.
- The bit table has at most ceil(m/63) rows (2^20 at the default) but
  never more than k·n distinct words, so the broadcast is ≤ 8 MB worst
  case and far smaller for selective key sets; membership is k broadcast
  hash joins, all in the scan stage, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dask_mwu_spark.functions.hashing import MINHASH_COEFFS, md5_long, universal_hash

BLOOM_K = 5
WORD_BITS = 63
# 2^20 words · 63 bits ≈ 6.6e7 bits — the sizing the module docstring's FPR
# math assumes (ADVICE r3: the old "// (1 << 6)" shrank this 64x, so 1e6
# keys saturated the filter and the pre-join pruned nothing)
DEFAULT_M_BITS = (1 << 20) * WORD_BITS
BLOOM_COEFFS = MINHASH_COEFFS[:BLOOM_K]


def _positions(key: F.Column, m_bits: int) -> list[F.Column]:
    h = md5_long(key.cast("string"))
    return [universal_hash(h, a, b) % m_bits for a, b in BLOOM_COEFFS]


def _positions_from_digest(h: F.Column, m_bits: int) -> list[F.Column]:
    """Positions from an ALREADY-projected digest column: the md5 is by far
    the most expensive term (measured 5x the whole filter cost when inlined
    per position — Spark codegen does not CSE it across projection
    expressions), so callers hash once into a column and derive the k
    positions with integer arithmetic only."""
    return [universal_hash(h, a, b) % m_bits for a, b in BLOOM_COEFFS]


def build_bloom(keys: DataFrame, key_col: str, *, m_bits: int = DEFAULT_M_BITS) -> DataFrame:
    """Bit table ``(word_idx INT, bits BIGINT)`` over the distinct keys.

    One explode (k rows per key) + one map-side-combinable bit_or — the
    filter builds in a single pass over the key set and the output is
    mergeable across batches (union + re-bit_or), so a persisted filter can
    be maintained incrementally like the LSH band index."""
    pos = keys.withColumn("_h", md5_long(F.col(key_col).cast("string"))).select(
        F.explode(
            F.array(*_positions_from_digest(F.col("_h"), m_bits))
        ).alias("pos")
    )
    return (
        pos.groupBy((F.col("pos") / WORD_BITS).cast("int").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))")
            ).alias("bits")
        )
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """Rows of ``df`` whose key passes the filter (all k bits set).

    k broadcast hash joins against the ≤ m/63-row bit table — scan-stage,
    no shuffle of ``df``; a missing word row means "no bit in this word was
    ever set", so the left-join NULL correctly fails the check.

    The k joins alias the bit table differently, so the INITIAL plan
    prints k copies of the build subtree — but AQE dedupes them at
    runtime (tests/test_bloom.py asserts k-1 ReusedExchange and exactly
    one real shuffle in the final plan), so no eager materialization is
    needed here; don't "fix" the initial-plan duplication.

    Nullability discipline (optimization r12): the probe columns are
    projected through ``coalesce(..., 0)`` so they are provably
    NON-NULLABLE attributes.  With nullable join keys Catalyst inferred
    ``isnotnull`` on every key and pushed those filters BELOW the
    projection, re-expanding each aliased position back into the full
    md5 chain — the scan-stage filter then evaluated the digest k+1
    times per row (measured 6x the md5 cost on lineitem_bloom_semi;
    the plan's Filter(2) held five copies of conv(md5(...))).  The
    coalesce never fires on data (md5 of a non-null key is never NULL,
    and NULL keys are dropped up front exactly as the old inner-join-
    on-NULL-key semantics did) — it exists purely to mark the
    attributes non-nullable so no isnotnull is inferred and the digest
    is computed ONCE per row."""
    out = df.where(F.col(key_col).isNotNull())
    digest = md5_long(F.col(key_col).cast("string"))
    positions = _positions_from_digest(F.col("_h"), m_bits)
    out = out.withColumn("_h", digest).select(
        "*",
        *[
            F.coalesce(p, F.lit(0)).alias(f"_p{j}")
            for j, p in enumerate(positions)
        ],
    )
    out = out.select(
        "*",
        *[
            F.coalesce((F.col(f"_p{j}") / WORD_BITS).cast("int"), F.lit(0)).alias(
                f"_wk{j}"
            )
            for j in range(BLOOM_K)
        ],
    )
    for j in range(BLOOM_K):
        bj = bloom.select(
            F.col("word_idx").alias(f"_w{j}"), F.col("bits").alias(f"_b{j}")
        )
        mask = F.expr(f"shiftleft(1L, cast(_p{j} % {WORD_BITS} as int))")
        out = out.join(
            F.broadcast(bj),
            F.col(f"_wk{j}") == F.col(f"_w{j}"),
            "left",
        ).where(F.col(f"_b{j}").bitwiseAND(mask).isNotNull()
                & (F.col(f"_b{j}").bitwiseAND(mask) != 0))
    return out.drop(
        "_h",
        *[
            c
            for j in range(BLOOM_K)
            for c in (f"_p{j}", f"_wk{j}", f"_w{j}", f"_b{j}")
        ],
    )


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    key_col: str | None = None,
    *,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """Exact semi join ``big ⋉ keys`` with Bloom pre-pruning: the filter
    eliminates almost all non-matching ``big`` rows before the join shuffle;
    the semi join then removes the false-positive residue, so the result is
    EXACTLY ``big.join(keys, on, "left_semi")`` — verified by the
    lineitem_bloom_semi oracle, which replays the bit math in DuckDB."""
    key_col = key_col or on
    bloom = build_bloom(keys, key_col, m_bits=m_bits)
    pruned = bloom_might_contain(big, on, bloom, m_bits=m_bits)
    return pruned.join(
        keys.select(F.col(key_col).alias(on)).distinct(), on, "left_semi"
    )
