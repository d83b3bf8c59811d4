"""Tests for byte packing (SURVEY.md §2.E4) — round-trips and parity with
Python reference semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from euclid_spark.functions.packing import left_pad32, pack_u32, unpack_u32


def test_left_pad32_pads_short_keys(spark):
    df = spark.createDataFrame([Row(b=b"\x01\x02")])
    got = df.select(left_pad32(F.col("b")).alias("p")).collect()[0]["p"]
    assert len(got) == 32
    assert got == b"\x00" * 30 + b"\x01\x02"


def test_left_pad32_rejects_long_input(spark):
    df = spark.createDataFrame([Row(b=b"\x01" * 33)])
    with pytest.raises(Exception, match="left_pad32"):
        df.select(left_pad32(F.col("b")).alias("p")).collect()


def test_pack_u32_big_endian_limbs(spark):
    raw = bytes(range(32))  # 00 01 02 ... 1f
    df = spark.createDataFrame([Row(b=raw)])
    got = df.select(pack_u32(F.col("b")).alias("l")).collect()[0]["l"]
    expected = [
        int.from_bytes(raw[4 * i : 4 * i + 4], "big") for i in range(8)
    ]
    assert got == expected


def test_pack_unpack_roundtrip(spark):
    raw = bytes([0xFF, 0x00] * 16)
    df = spark.createDataFrame([Row(b=raw)])
    got = df.select(
        unpack_u32(pack_u32(F.col("b"))).alias("rt")
    ).collect()[0]["rt"]
    assert got == raw


def test_padded_key_digest_is_width_independent(spark):
    """Keys 0x0102 and left-padded 32-byte 0x..0102 pack to the same
    limbs — the canonicalization the reference relies on for key sets."""
    df = spark.createDataFrame([Row(short=b"\x01\x02", wide=b"\x00" * 30 + b"\x01\x02")])
    got = df.select(
        pack_u32(left_pad32(F.col("short"))).alias("a"),
        pack_u32(left_pad32(F.col("wide"))).alias("b"),
    ).collect()[0]
    assert got["a"] == got["b"]
