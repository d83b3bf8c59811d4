"""Skew utilities must be result-equivalent to their naive plans — the
rewrite only changes the physical distribution of work."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.operators.skew import salted_agg, salted_join
from tests.conftest import SF_SMOKE


def _skewed_events(spark):
    """events with one synthetic whale user dominating row count."""
    from euclid_spark.catalog import load_events

    ev = load_events(spark, SF_SMOKE).select("event_id", "user_id", "value")
    whale = ev.withColumn("user_id", F.lit(999_999))
    return ev.unionAll(whale).unionAll(whale)


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed_events(spark)
    plain = {
        r["user_id"]: (round(r["s"], 6), r["n"])
        for r in df.groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r["user_id"]: (round(r["s"], 6), r["n"])
        for r in salted_agg(
            df,
            keys=["user_id"],
            partial_aggs=[F.sum("value").alias("ps"), F.count("*").alias("pn")],
            final_aggs=[F.sum("ps").alias("s"), F.sum("pn").alias("n")],
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain_join(spark):
    df = _skewed_events(spark)
    dim = spark.createDataFrame(
        [(999_999, "whale")] + [(i, f"u{i}") for i in range(20)],
        "user_id long, tag string",
    )
    plain = sorted(
        (r["event_id"], r["tag"])
        for r in df.join(dim, "user_id").select("event_id", "tag").collect()
    )
    salted = sorted(
        (r["event_id"], r["tag"])
        for r in salted_join(df, dim, "user_id").select("event_id", "tag").collect()
    )
    assert plain == salted
    assert len(plain) > 0


def test_salt_spreads_hot_key(spark):
    from euclid_spark.operators.skew import with_salt

    df = _skewed_events(spark).filter(F.col("user_id") == 999_999)
    n_buckets = (
        with_salt(df).select("_salt").distinct().count()
    )
    assert n_buckets > 4  # the whale's rows hash across many salts


def test_salt_spreads_byte_identical_rows(spark):
    """The ADVICE r1 pathology: a hot key whose rows are byte-identical
    (zero non-key entropy). A column-hash-only salt collapses them onto
    one bucket; the monotonic-id term must spread them anyway."""
    from euclid_spark.operators.skew import DEFAULT_SALTS, with_salt

    df = spark.range(20_000).select(
        F.lit(999_999).alias("user_id"), F.lit(1.0).alias("value")
    )
    n_buckets = (
        with_salt(df, key_cols=["user_id"]).select("_salt").distinct().count()
    )
    assert n_buckets == DEFAULT_SALTS
