"""Keccak-256 known-answer vectors + batch/sponge cross-check.

Pins bit-exactness of the Ethereum hash (VERDICT r1 #5): the driver's
DuckDB oracle has no keccak, so `euclid_mapping_extract_keccak` is
rows-only there — THESE vectors are its correctness gate. All expected
digests are public knowledge (Keccak reference test vectors; the
64-zero-byte digest is the well-known eth2 zerohash level 1; the
32-zero-byte digest is Ethereum's canonical empty-storage-slot hash).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from euclid_spark.functions.keccak import _RATE, keccak256, keccak256_batch

# (input bytes, expected keccak-256 hex) — original 0x01 padding, NOT sha3
VECTORS = [
    (b"", "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"),
    (b"abc", "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"),
    (bytes(32), "290decd9548b62a8d60345a988386fc84ba6bc95484008f6362f93160ef3e563"),
    (bytes(64), "ad3228b676f7d3cd4284a5443f17f1962b36e491b30a40b2405849e597ba5fb5"),
]


@pytest.mark.parametrize("data,expect", VECTORS)
def test_known_answer_sponge(data, expect):
    assert keccak256(data).hex() == expect


def test_batch_matches_sponge_all_lengths():
    """Vectorized single-block path ≡ reference sponge, including the
    padding edge cases (len ≡ rate-1 → 0x81 single byte) and the >1-block
    fallback."""
    rng = random.Random(7)
    lengths = [0, 1, 31, 32, 63, 64, _RATE - 2, _RATE - 1, _RATE, _RATE + 1, 400]
    items = [bytes(rng.randrange(256) for _ in range(n)) for n in lengths]
    got = keccak256_batch(items)
    for it, d in zip(items, got):
        assert d == keccak256(it)


def test_solidity_mapping_slot_layout():
    """Solidity storage layout (public docs): mapping value for key k at
    slot p lives at keccak256(pad32(k) ++ pad32(p)). key=0, slot=0 is the
    64-zero-byte vector above; spot-check a nonzero key round-trips
    through the same padding the Spark column expression uses."""
    key, slot = 0x42, 3
    loc = keccak256(key.to_bytes(32, "big") + slot.to_bytes(32, "big"))
    assert loc == keccak256_batch([key.to_bytes(32, "big") + slot.to_bytes(32, "big")])[0]
    assert len(loc) == 32


def test_spark_keccak_column(spark):
    """keccak256_hex pandas UDF agrees with the reference sponge on a
    DataFrame of binary payloads (the actual plumbing used by
    euclid_mapping_extract_keccak)."""
    from euclid_spark.functions.mpt import keccak256_hex

    rows = [(i, bytes([i]) * (i % 70)) for i in range(40)]
    df = spark.createDataFrame(rows, "id int, payload binary")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", keccak256_hex(F.col("payload")).alias("h")).collect()
    }
    for i, payload in rows:
        assert got[i] == keccak256(payload).hex()
