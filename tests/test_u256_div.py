"""u256 divmod vs Python big-int reference, plus the exact ERC-20 leaf
computation value·rate/supply in full 256-bit arithmetic. Each case
selects the ONE divmod struct column (see u256_divmod docstring: HOF
expressions get no CSE, so fields are read from the collected row)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from euclid_spark.functions.u256 import (
    u256_divmod,
    u256_from_hex,
    u256_mul,
    u256_to_hex,
)

MOD = 2**256


def test_u256_divmod_random_pairs(spark):
    rng = random.Random(99)
    pairs = []
    for _ in range(40):
        a = rng.randrange(MOD)
        b = rng.randrange(1, max(2, MOD >> rng.randrange(0, 200)))
        pairs.append((a, b))
    pairs += [(5, 3), (MOD - 1, 1), (MOD - 1, MOD - 1), (0, 7), (7, MOD - 1), (42, 0)]
    rows = [(f"{a:064x}", f"{b:064x}") for a, b in pairs]
    df = spark.createDataFrame(rows, "a string, b string")

    res = u256_divmod(u256_from_hex(F.col("a")), u256_from_hex(F.col("b")))
    got = df.select(res.alias("res")).collect()

    for row, (a, b) in zip(got, pairs):
        r = row["res"]
        if b == 0:
            assert r["div_by_zero"] is True and int(r["q_hex"], 16) == 0
        else:
            assert r["div_by_zero"] is False
            assert r["q_hex"] == f"{a // b:064x}", (a, b)
            assert r["r_hex"] == f"{a % b:064x}", (a, b)


def test_erc20_leaf_u256_semantics(spark):
    """The exact reference leaf computation (query_erc20/storage/leaf.rs:
    value * rewards_rate, overflow-guarded, / total_supply, zero-guarded)
    in full 256-bit arithmetic, mul piped into divmod."""
    cases = [
        (10**30, 7, 3 * 10**18),
        (2**200, 2**55, 12345),
        (0, 99, 10),
        (5, 5, 0),  # zero supply → guard fires
    ]
    rows = [(f"{v:064x}", f"{r:064x}", f"{s:064x}") for v, r, s in cases]
    df = spark.createDataFrame(rows, "v string, r string, s string")

    prod, ovf = u256_mul(u256_from_hex(F.col("v")), u256_from_hex(F.col("r")))
    # materialize the product hex once, then divide in a second select —
    # embedding the mul fold inside the divmod state would re-evaluate it
    staged = df.select(
        "s", u256_to_hex(prod).alias("prod_hex"), ovf.alias("ovf")
    )
    res = u256_divmod(u256_from_hex(F.col("prod_hex")), u256_from_hex(F.col("s")))
    got = staged.select(res.alias("res"), "ovf").collect()

    for row, (v, r, s) in zip(got, cases):
        assert row["ovf"] == (v * r >= MOD)
        if s == 0:
            assert row["res"]["div_by_zero"] is True
        else:
            assert row["res"]["div_by_zero"] is False
            assert int(row["res"]["q_hex"], 16) == ((v * r) % MOD) // s


def test_divmod_small_matches_python_ints(spark):
    """Short division (divisor < 2³¹) vs Python bigints, including the
    guard edges: d = 0 (div_by_zero), d = 2³¹-1 (largest legal),
    d ≥ 2³¹ (small_ok = False, zeros)."""
    import random

    from pyspark.sql import functions as F

    from euclid_spark.functions.u256 import u256_divmod_small, u256_from_hex

    rng = random.Random(17)
    rows = []
    for _ in range(200):
        a = rng.randrange(2**256)
        d = rng.choice(
            [0, 1, 2, 7, 65535, 2**31 - 1, 2**31, 2**40, rng.randrange(1, 2**31)]
        )
        rows.append((f"{a:064x}", d))
    df = spark.createDataFrame(rows, "a_hex string, d long")
    got = df.select(
        "a_hex",
        "d",
        u256_divmod_small(u256_from_hex(F.col("a_hex")), F.col("d")).alias("r"),
    ).collect()
    for r in got:
        a, d, res = int(r["a_hex"], 16), r["d"], r["r"]
        if d == 0:
            assert res["div_by_zero"] and int(res["q_hex"], 16) == 0
        elif d >= 2**31:
            assert not res["small_ok"] and int(res["q_hex"], 16) == 0
        else:
            assert res["small_ok"] and not res["div_by_zero"]
            assert int(res["q_hex"], 16) == a // d
            assert int(res["r_hex"], 16) == a % d
