"""B48 linear-counting distinct sketch: merge law (bit_or of halves ==
bitmap of union), accuracy in the designed regime (n ≲ m), saturation
guard, and the fixed-size property."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.operators.distinct_sketch import (
    LC_BITS,
    LC_WORDS,
    lc_bitmap,
    lc_distinct,
)
from tests.conftest import SF_SMOKE


def test_estimate_accuracy_in_designed_regime(spark):
    """At the smoke SF each event type has ≪ LC_BITS distinct users —
    the standard-error regime where LC tracks within a few percent."""
    rows = lc_distinct(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["exact_distinct"] < LC_BITS  # designed regime holds here
        assert r["lc_estimate"] is not None
        rel = abs(r["lc_estimate"] - r["exact_distinct"]) / max(
            r["exact_distinct"], 1
        )
        assert rel < 0.15, (r["grp"], r["lc_estimate"], r["exact_distinct"])


def test_bitmap_merge_law(spark):
    """bit_or of two halves' bitmaps == bitmap of the union (the D20
    monoid law, checked directly)."""
    a = spark.range(0, 700).select(F.lit("g").alias("grp"), F.col("id").alias("k"))
    b = spark.range(350, 1000).select(F.lit("g").alias("grp"), F.col("id").alias("k"))
    merged = (
        lc_bitmap(a, "grp", "k")
        .unionByName(lc_bitmap(b, "grp", "k"))
        .groupBy("grp", "word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    whole = lc_bitmap(a.unionByName(b), "grp", "k")
    m = {r["word_idx"]: r["word"] for r in merged.collect()}
    w = {r["word_idx"]: r["word"] for r in whole.collect()}
    assert m == w


def test_fixed_size_and_saturation_guard(spark):
    """The bitmap never exceeds LC_WORDS rows per group, and a group
    with ≫ m distinct keys reports a NULL estimate (saturated), not an
    infinity."""
    big = spark.range(100_000).select(
        F.lit("g").alias("grp"), F.col("id").alias("k")
    )
    bm = lc_bitmap(big, "grp", "k")
    assert bm.count() <= LC_WORDS
    total = bm.agg(F.sum(F.bit_count("word"))).collect()[0][0]
    assert total == LC_BITS  # fully saturated
    # the face-level guard: saturated → NULL estimate (mirror the math)
    zero_frac = (LC_BITS - total) / LC_BITS
    assert zero_frac == 0
