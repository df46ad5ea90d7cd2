"""Cross-engine deterministic hashing for the dedup/similarity operators.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
functions, so oracle-checkable dedup needs a hash both engines compute
identically: md5 (bit-identical everywhere) reinterpreted as a 60-bit
integer (15 hex chars — fits BIGINT in both engines), then universal-hash
families ``(a*x + b) mod p`` over it with fixed coefficients.

All arithmetic stays below 2^62: x mod p < 2^30, a < 2^30, so a*x' + b
< 2^60 — no overflow in either engine's BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 1_000_000_007  # < 2^30

# 16 fixed universal-hash coefficient pairs (seeded once, hardcoded so the
# SQL oracles embed the exact same constants)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (668265263, 374761393),
    (935587133, 652821869),
    (790335461, 522133279),
    (374761397, 902460479),
    (268435399, 117418271),
    (593689053, 286160981),
    (652821949, 668265407),
    (936586559, 386910137),
    (168443755, 982451653),
    (654188429, 441845263),
    (104395303, 715225739),
    (472882049, 533000401),
    (961748941, 179424673),
    (715225741, 104395301),
    (533000389, 472882027),
    (179424691, 961748927),
]


def md5_long(c: Column) -> Column:
    """60-bit integer view of md5(c) — identical in Spark and DuckDB
    (DuckDB twin: CAST('0x' || substr(md5(x),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of md5_long."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def universal_hash(x: Column, a: int, b: int, p: int = MERSENNE_P) -> Column:
    return (x % p * F.lit(a) + F.lit(b)) % p


def universal_hash_sql(expr: str, a: int, b: int, p: int = MERSENNE_P) -> str:
    return f"(({expr}) % {p} * {a} + {b}) % {p}"
