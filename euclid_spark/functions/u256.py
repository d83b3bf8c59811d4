"""uint256 helpers (SURVEY.md §2.E2).

The reference computes on 256-bit EVM words in-circuit (UInt256Target,
e.g. query_erc20/storage/leaf.rs guards a u256 mul overflow). Spark's
widest exact numeric is decimal(38,0) (~2¹²⁶), so a u256 is carried as a
(hi, lo) pair of 128-bit halves, each in a decimal(38,0) column.

Provided: hex ↔ pair conversion, addition with carry, comparison, and an
overflow guard mirroring the circuit's "prover must not overflow" check.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

DEC38 = DecimalType(38, 0)
TWO_128 = 2**128


def u256_from_hex(col: Column) -> tuple[Column, Column]:
    """Split a 0x-less hex string (≤64 chars) into (hi, lo) decimal(38,0).

    conv() parses ≤16 hex chars exactly into int64, so each 128-bit half
    is assembled from two 64-bit limbs: half = limb_hi * 2⁶⁴ + limb_lo.
    """
    padded = F.lpad(col, 64, "0")

    def limb(start: int) -> Column:  # 16 hex chars → uint64 (as decimal)
        return F.conv(F.substring(padded, start, 16), 16, 10).cast(DEC38)

    two64 = F.lit(2**64).cast(DEC38)
    hi = limb(1) * two64 + limb(17)
    lo = limb(33) * two64 + limb(49)
    return hi.cast(DEC38), lo.cast(DEC38)


def u256_add(
    a: tuple[Column, Column], b: tuple[Column, Column]
) -> tuple[Column, Column]:
    """256-bit addition with carry; wraps mod 2²⁵⁶ like EVM arithmetic."""
    two128 = F.lit(TWO_128).cast(DEC38)
    lo_sum = a[1] + b[1]
    carry = F.when(lo_sum >= two128, F.lit(1)).otherwise(F.lit(0)).cast(DEC38)
    lo = (lo_sum - carry * two128).cast(DEC38)
    hi = (a[0] + b[0] + carry) % two128
    return hi.cast(DEC38), lo


def u256_lt(a: tuple[Column, Column], b: tuple[Column, Column]) -> Column:
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def u256_eq(a: tuple[Column, Column], b: tuple[Column, Column]) -> Column:
    return (a[0] == b[0]) & (a[1] == b[1])


def u256_add_overflows(a: tuple[Column, Column], b: tuple[Column, Column]) -> Column:
    """True when a+b wraps past 2²⁵⁶ — the guard the circuit enforces
    (query_erc20/storage/leaf.rs:89 'ensure the prover is not trying to
    obtain invalid results by overflowing')."""
    hi, lo = u256_add(a, b)
    return u256_lt((hi, lo), a)


def u256_to_hex(pair: tuple[Column, Column]) -> Column:
    """Back to a 64-char lowercase hex string via 64-bit limbs."""
    two64 = F.lit(2**64).cast(DEC38)

    def limbs(half: Column) -> tuple[Column, Column]:
        hi64 = F.floor(half / two64).cast(DEC38)
        lo64 = (half - hi64 * two64).cast(DEC38)
        return hi64, lo64

    parts = [*limbs(pair[0]), *limbs(pair[1])]
    hexed = [
        F.lpad(F.lower(F.conv(p.cast("string"), 10, 16)), 16, "0") for p in parts
    ]
    return F.concat(*hexed)
