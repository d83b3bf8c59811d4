"""B47 quantile sketch: the relative-error guarantee the bucket scheme
promises, exactness of small-value buckets, and the fixed bucket
universe (the at-scale property — sketch size independent of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.operators.quantile_sketch import (
    QS,
    SUB_BITS,
    hdr_quantiles,
    hdr_sketch,
)
from tests.conftest import SF_SMOKE


def test_estimates_within_bucket_error_bound(spark):
    """est is the containing bucket's lower bound → it may undershoot
    the exact percentile by at most one bucket width: relative error
    ≤ 2^-SUB_BITS (+ interpolation slack)."""
    rows = hdr_quantiles(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    tol = 2 ** -SUB_BITS + 0.01
    for r in rows:
        for q in QS:
            est, exact = r[f"p{q}_est"], r[f"p{q}_exact"]
            assert est <= exact * (1 + 0.001), (r["grp"], q, est, exact)
            assert est >= exact * (1 - tol), (r["grp"], q, est, exact)


def test_small_values_bucket_exactly(spark):
    """Values below 2^(SUB_BITS+1) get singleton buckets — a corpus of
    small integers sketches losslessly."""
    df = spark.createDataFrame(
        [("g", v) for v in (1, 2, 3, 30, 31)], "grp string, v long"
    )
    sk = {(r["nbits"], r["sub"]): r["cnt"] for r in hdr_sketch(df, "grp", "v").collect()}
    assert sk == {(SUB_BITS + 1, v): 1 for v in (1, 2, 3, 30, 31)}


def test_bucket_universe_is_fixed(spark):
    """At any data volume the sketch has ≤ 64·2^SUB_BITS rows per
    group — the property that makes it a broadcastable, mergeable
    monoid at 100 TB."""
    df = spark.range(200_000).select(
        F.lit("g").alias("grp"), (F.col("id") * 7919 % 2**40 + 1).alias("v")
    )
    n = hdr_sketch(df, "grp", "v").count()
    assert n <= 64 * (1 << SUB_BITS)


def test_sketch_is_mergeable_monoid(spark):
    """Summing two halves' sketches == sketching the union (the D20
    merge law, checked directly)."""
    a = spark.range(0, 5000).select(
        F.lit("g").alias("grp"), (F.col("id") % 997 + 1).alias("v")
    )
    b = spark.range(5000, 11000).select(
        F.lit("g").alias("grp"), (F.col("id") % 4093 + 1).alias("v")
    )
    merged = (
        hdr_sketch(a, "grp", "v")
        .unionByName(hdr_sketch(b, "grp", "v"))
        .groupBy("grp", "nbits", "sub")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = hdr_sketch(a.unionByName(b), "grp", "v")
    m = {(r["nbits"], r["sub"]): r["cnt"] for r in merged.collect()}
    w = {(r["nbits"], r["sub"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_integer_bit_length_matches_string_route(spark):
    """r15: nbits moved from length(conv(v, 10, 2)) — two string
    formats per row — to an unrolled integer binary search. The two
    must agree on every power-of-two boundary (where an off-by-one
    flips the bucket) and across the 62-bit range."""
    import random

    rng = random.Random(15)
    vals = sorted(
        {v for k in range(63) for v in ((1 << k) - 1, 1 << k, (1 << k) + 1)
         if 1 <= v < 2 ** 63}
        | {rng.randrange(1, 2 ** 62) for _ in range(500)}
    )
    df = spark.createDataFrame(
        [(int(v),) for v in vals], "v long"
    ).withColumn("grp", F.lit("g"))
    got = {
        (r["nbits"], r["sub"]): r["cnt"]
        for r in hdr_sketch(df, "grp", "v").collect()
    }
    lo = 1 << (SUB_BITS + 1)
    want: dict = {}
    for v in vals:
        nbits = SUB_BITS + 1 if v < lo else v.bit_length()
        sub = v if v < lo else (v >> (v.bit_length() - (SUB_BITS + 1))) & (
            (1 << SUB_BITS) - 1
        )
        want[(nbits, sub)] = want.get((nbits, sub), 0) + 1
    assert got == want
