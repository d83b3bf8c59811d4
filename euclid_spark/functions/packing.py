"""Byte packing helpers (SURVEY.md §2.E4).

The reference left-pads mapping keys to 32 bytes and packs byte arrays
into u32 limbs before hashing (mrp2-utils/src/utils.rs `Packer` /
`left_pad32`, used e.g. in query2/revelation/mod.rs:70 to canonicalize
mapping keys). Same canonicalization here as column expressions, so keys
of any width digest identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def left_pad32(col: Column) -> Column:
    """Left-pad a binary column to exactly 32 bytes (error if longer),
    mirroring the reference's `left_pad32` key canonicalization."""
    n = F.length(col)
    # stay in the binary domain: repeat() yields a string, so build the
    # pad as hex and unhex it (concat(string, binary) would coerce to str)
    pad = F.unhex(F.repeat(F.lit("00"), (F.lit(32) - n).cast("int")))
    return F.when(n <= 32, F.concat(pad, col)).otherwise(
        F.raise_error(F.lit("left_pad32: input exceeds 32 bytes"))
    )


def pack_u32(col: Column) -> Column:
    """Pack a 32-byte binary column into 8 big-endian u32 limbs
    (array<long>), the reference's packed representation (PACKED_*_LEN
    constants in mrp2-utils). Uses conv(hex) per 4-byte slice — pure
    column expressions."""
    hexed = F.lower(F.hex(col))
    return F.array(
        *[
            F.conv(F.substring(hexed, 1 + 8 * i, 8), 16, 10).cast("long")
            for i in range(8)
        ]
    )


def unpack_u32(limbs: Column) -> Column:
    """Inverse of pack_u32: 8 u32 limbs back to a 32-byte binary."""
    hex_parts = [
        F.lpad(F.lower(F.conv(F.get(limbs, i).cast("string"), 10, 16)), 8, "0")
        for i in range(8)
    ]
    return F.unhex(F.concat(*hex_parts))
