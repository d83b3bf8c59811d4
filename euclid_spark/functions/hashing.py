"""Hashing / digest column expressions.

The reference commits to a table with an *order-independent* digest: each
mapping entry is hashed to a curve point and the points are summed, so any
traversal order yields the same commitment (group hashing, see
mr-plonky2-circuits/src/storage/digest_equal.rs and
mrp2-utils/src/group_hashing/). The Spark-native analog below maps each row
to an integer with a deterministic mixing function and sums modulo a prime
— commutative + associative, hence map-side combinable and skew-immune,
and (unlike cryptographic group hashing) expressible in ANSI SQL so an
external oracle (DuckDB) can recompute it bit-for-bit.

`stable_hash64`/`md5_hex` are the Poseidon/Keccak stand-ins: xxhash64 for
JVM-side speed where cross-engine parity is not needed, md5 (hex) where
the oracle must reproduce the value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime modulus for the additive digest; small enough that summing billions
# of terms stays far from int64 overflow (1e9 * 1e10 rows ~ 1e19 > 2^63, so
# the agg reduces mod P on partial sums via the final % as well — at 100 TB
# partial sums per partition stay < 2^63 for < ~9e9 rows per partition).
DIGEST_PRIME = 1_000_000_007

# Knuth multiplicative-hash constant (public domain folklore).
MIX = 2_654_435_761


def stable_hash64(*cols: Column | str) -> Column:
    """Fast 64-bit deterministic hash (xxhash64), non-negative via pmod."""
    return F.pmod(F.xxhash64(*cols), F.lit(2**62))


def md5_hex(col: Column | str) -> Column:
    """Lowercase hex md5 — identical output in Spark and DuckDB."""
    return F.md5(F.col(col) if isinstance(col, str) else col)


def digest_term(*int_cols: Column, weights: tuple[int, ...] | None = None) -> Column:
    """Per-row digest term: (c0*MIX + c1*w1 + ...) % DIGEST_PRIME.

    Inputs must be integral columns with |value * weight| < 2^62.
    """
    if weights is None:
        weights = (MIX,) + tuple(97 + 6 * i for i in range(len(int_cols) - 1))
    acc = None
    for c, w in zip(int_cols, weights):
        term = c.cast("long") * F.lit(w)
        acc = term if acc is None else acc + term
    return F.pmod(acc, F.lit(DIGEST_PRIME))


def digest_agg(term: Column) -> Column:
    """Order-independent table digest: SUM(term) % P, as bigint."""
    return F.pmod(F.sum(term), F.lit(DIGEST_PRIME)).cast("long")
