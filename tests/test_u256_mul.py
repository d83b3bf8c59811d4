"""u256 multiplication vs Python big-int reference: product mod 2²⁵⁶ and
the overflow guard the circuit enforces, over seeded random pairs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from euclid_spark.functions.u256 import u256_from_hex, u256_mul, u256_to_hex

N = 100
MOD = 2**256


def test_u256_mul_random_pairs(spark):
    rng = random.Random(7)

    def rand_u256() -> int:
        choice = rng.randrange(4)
        if choice == 0:
            return rng.randrange(MOD)
        if choice == 1:
            return rng.randrange(2**128)
        if choice == 2:
            return rng.randrange(2**33)  # products stay under 2^256
        return rng.randrange(2**8)

    pairs = [(rand_u256(), rand_u256()) for _ in range(N)]
    pairs += [(0, MOD - 1), (1, MOD - 1), (2**128, 2**128), (2**255, 2)]
    rows = [(f"{a:064x}", f"{b:064x}") for a, b in pairs]
    df = spark.createDataFrame(rows, "a string, b string")

    prod, ovf = u256_mul(u256_from_hex(F.col("a")), u256_from_hex(F.col("b")))
    got = df.select(
        u256_to_hex(prod).alias("prod_hex"), ovf.alias("ovf")
    ).collect()

    for r, (x, y) in zip(got, pairs):
        assert r["prod_hex"] == f"{(x * y) % MOD:064x}", (x, y)
        assert r["ovf"] == (x * y >= MOD), (x, y)
