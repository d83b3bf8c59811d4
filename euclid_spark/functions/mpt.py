"""Storage-slot → MPT-key derivation (SURVEY.md §2.E3/E4 companion).

Mirrors mr-plonky2-circuits/src/storage/key.rs: the storage *location* of
a mapping entry is keccak(left_pad32(mapping_key) || left_pad32(slot)),
and the MPT lookup key is keccak(location), consumed as nibbles.

Keccak-256 is not available as a Spark builtin; sha2-256 is the
documented stand-in (same shape: 32-byte digest of the padded 64-byte
tuple). Swap `_hash_hex` for a keccak UDF where bit-exact Ethereum
parity is required — every other part of the derivation is identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from euclid_spark.functions.packing import left_pad32


def _hash_hex(binary: Column) -> Column:
    """32-byte digest as lowercase hex (keccak256 stand-in)."""
    return F.lower(F.sha2(binary, 256))


def mapping_location(mapping_key: Column, slot: Column) -> Column:
    """Storage location of mapping[key] at a slot: H(pad32(key) ||
    pad32(slot)), hex. (key.rs INPUT_TUPLE_LEN = 2×32 bytes.)"""
    return _hash_hex(F.concat(left_pad32(mapping_key), left_pad32(slot)))


def mpt_key(location_hex: Column) -> Column:
    """MPT lookup key = H(location) (key.rs keccak_mpt_key), hex."""
    return _hash_hex(F.unhex(location_hex))


def keccak256_hex(col: Column) -> Column:
    """Bit-exact Ethereum keccak-256 of a binary column, as lowercase hex.

    Arrow-batched pandas UDF over the numpy-vectorized single-block
    permutation (functions/keccak.py) — one keccak-f pass per Arrow batch,
    not one Python sponge per row. Cold path by design: key derivation is
    the one-time extraction/indexing step, never a per-query expression."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _keccak(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        from euclid_spark.functions.keccak import keccak256_batch

        vals = [b if b is not None else b"" for b in s]
        return pd.Series([d.hex() for d in keccak256_batch(vals)])

    return _keccak(col)


def mapping_location_keccak(mapping_key: Column, slot: Column) -> Column:
    """mapping_location with real keccak — what a user with live Ethereum
    data needs for bit-exact storage keys (mrp2-utils/src/storage_key.rs)."""
    return keccak256_hex(F.concat(left_pad32(mapping_key), left_pad32(slot)))


def mpt_key_keccak(location_hex: Column) -> Column:
    return keccak256_hex(F.unhex(location_hex))


def to_nibbles(hex_col: Column) -> Column:
    """Hex string → array of nibble values 0-15 (the MPTKeyWire NIBBLES
    form used for trie traversal)."""
    chars = F.split(hex_col, "(?!$)")
    return F.transform(chars, lambda c: F.conv(c, 16, 10).cast("int"))
