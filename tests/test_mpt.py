"""MPT key derivation parity with a Python hashlib reference."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from euclid_spark.functions.mpt import mapping_location, mpt_key, to_nibbles


def _ref_location(key: bytes, slot: int) -> str:
    padded = key.rjust(32, b"\x00") + slot.to_bytes(32, "big")
    return hashlib.sha256(padded).hexdigest()


def test_mapping_location_matches_reference(spark):
    key, slot = b"\x12\x34", 3
    df = spark.createDataFrame([Row(k=key, s=slot.to_bytes(1, "big"))])
    got = df.select(
        mapping_location(F.col("k"), F.col("s")).alias("loc")
    ).collect()[0]["loc"]
    assert got == _ref_location(key, slot)


def test_mpt_key_is_hash_of_location(spark):
    key, slot = b"\x01", 0
    loc = _ref_location(key, slot)
    expected = hashlib.sha256(bytes.fromhex(loc)).hexdigest()
    df = spark.createDataFrame([Row(k=key, s=slot.to_bytes(1, "big"))])
    got = df.select(
        mpt_key(mapping_location(F.col("k"), F.col("s"))).alias("mk")
    ).collect()[0]["mk"]
    assert got == expected


def test_to_nibbles(spark):
    df = spark.createDataFrame([Row(h="0af3")])
    got = df.select(to_nibbles(F.col("h")).alias("n")).collect()[0]["n"]
    assert got == [0, 10, 15, 3]
    assert len(got) == 4
