"""Unit tests for the functions/ library (SURVEY.md §5 level 1)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from euclid_spark.functions.hashing import DIGEST_PRIME, digest_agg, digest_term
from euclid_spark.functions.text import normalized_text, shingles, words
from euclid_spark.functions.vectors import cosine, dot
from euclid_spark.functions.u256 import (
    u256_add,
    u256_add_overflows,
    u256_from_hex,
    u256_lt,
    u256_to_hex,
)


def test_digest_is_order_independent(spark):
    rows = [Row(k=i, g=i % 3) for i in range(100)]
    df1 = spark.createDataFrame(rows)
    df2 = spark.createDataFrame(list(reversed(rows))).repartition(7)
    term = lambda df: digest_term(F.col("k").cast("long"), F.col("g").cast("long"))  # noqa: E731
    d1 = {r["g"]: r["d"] for r in df1.groupBy("g").agg(digest_agg(term(df1)).alias("d")).collect()}
    d2 = {r["g"]: r["d"] for r in df2.groupBy("g").agg(digest_agg(term(df2)).alias("d")).collect()}
    assert d1 == d2
    assert all(0 <= v < DIGEST_PRIME for v in d1.values())


def test_dot_and_cosine_match_python(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([Row(a=a, b=b)])
    got = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    exp_dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    assert abs(got["d"] - exp_dot) < 1e-12
    assert abs(got["c"] - exp_dot / (na * nb)) < 1e-12


def test_cosine_zero_vector_guard(spark):
    df = spark.createDataFrame([Row(a=[0.0, 0.0], b=[1.0, 2.0])])
    assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"] == 0.0


def test_text_normalization_and_shingles(spark):
    df = spark.createDataFrame([Row(text="  The   QUICK brown  fox ")])
    got = (
        df.select(
            normalized_text("text").alias("n"), words("text").alias("w")
        )
        .select("n", "w", shingles(F.col("w"), k=3).alias("s"))
        .collect()[0]
    )
    assert got["n"] == "the quick brown fox"
    assert got["w"] == ["the", "quick", "brown", "fox"]
    assert got["s"] == ["the quick brown", "quick brown fox"]


def test_shingles_short_doc_is_empty(spark):
    df = spark.createDataFrame([Row(text="one two")])
    got = df.select(words("text").alias("w")).select(
        shingles(F.col("w"), k=3).alias("s")
    )
    assert got.collect()[0]["s"] == []


def test_u256_roundtrip_add_compare(spark):
    a_hex = "ff" * 32  # 2^256 - 1
    b_hex = "01"
    df = spark.createDataFrame([Row(a=a_hex, b=b_hex)])
    a = u256_from_hex(F.col("a"))
    b = u256_from_hex(F.col("b"))
    s = u256_add(a, b)
    got = df.select(
        u256_to_hex(a).alias("a_rt"),
        u256_to_hex(s).alias("sum_hex"),
        u256_lt(b, a).alias("b_lt_a"),
        u256_add_overflows(a, b).alias("ovf"),
    ).collect()[0]
    assert got["a_rt"] == a_hex
    assert got["sum_hex"] == "0" * 64  # wraps mod 2^256
    assert got["b_lt_a"] is True
    assert got["ovf"] is True


def test_u256_add_no_overflow(spark):
    df = spark.createDataFrame([Row(a="05", b="07")])
    a = u256_from_hex(F.col("a"))
    b = u256_from_hex(F.col("b"))
    got = df.select(
        u256_to_hex(u256_add(a, b)).alias("s"),
        u256_add_overflows(a, b).alias("ovf"),
    ).collect()[0]
    assert got["s"] == "0" * 63 + "c"
    assert got["ovf"] is False
