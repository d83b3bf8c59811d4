"""Randomized u256 verification against Python big-int arithmetic:
200 seeded random pairs checked in a single Spark job (hex round-trip,
add-mod-2²⁵⁶, comparison, overflow flag)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from euclid_spark.functions.u256 import (
    u256_add,
    u256_add_overflows,
    u256_from_hex,
    u256_lt,
    u256_to_hex,
)

N = 200
MOD = 2**256


def test_u256_random_pairs_match_python(spark):
    rng = random.Random(42)

    def rand_u256() -> int:
        # mix magnitudes: full-width, half-width, tiny, boundary-ish
        choice = rng.randrange(4)
        if choice == 0:
            return rng.randrange(MOD)
        if choice == 1:
            return rng.randrange(2**128)
        if choice == 2:
            return rng.randrange(2**16)
        return MOD - 1 - rng.randrange(2**20)

    pairs = [(rand_u256(), rand_u256()) for _ in range(N)]
    rows = [(f"{a:064x}", f"{b:064x}") for a, b in pairs]
    df = spark.createDataFrame(rows, "a string, b string")

    a = u256_from_hex(F.col("a"))
    b = u256_from_hex(F.col("b"))
    got = df.select(
        "a",
        "b",
        u256_to_hex(a).alias("a_rt"),
        u256_to_hex(u256_add(a, b)).alias("sum_hex"),
        u256_lt(a, b).alias("a_lt_b"),
        u256_add_overflows(a, b).alias("ovf"),
    ).collect()

    for r, (x, y) in zip(got, pairs):
        assert r["a_rt"] == f"{x:064x}"
        assert r["sum_hex"] == f"{(x + y) % MOD:064x}"
        assert r["a_lt_b"] == (x < y)
        assert r["ovf"] == (x + y >= MOD)
