"""CDC / SCD2 semantics: upsert vs naive recompute, history validity
ranges, and block-height time travel."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.operators.cdc import (
    dedupe_latest,
    merge_upsert,
    scd2_apply,
    snapshot_at,
)


def _log(spark):
    # (account, block, balance) change log — two keys, three versions
    return spark.createDataFrame(
        [
            (1, 100, 10.0),
            (1, 200, 15.0),
            (1, 300, 12.0),
            (2, 150, 99.0),
        ],
        "acct long, block long, bal double",
    )


def test_merge_upsert_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, 100, 10.0), (2, 150, 99.0)], "acct long, block long, bal double"
    )
    updates = spark.createDataFrame(
        [(2, 400, 50.0), (3, 400, 7.0)], "acct long, block long, bal double"
    )
    out = {
        r["acct"]: (r["block"], r["bal"])
        for r in merge_upsert(target, updates, "acct").collect()
    }
    assert out == {1: (100, 10.0), 2: (400, 50.0), 3: (400, 7.0)}


def test_dedupe_latest_picks_highest_version(spark):
    out = {
        r["acct"]: r["bal"] for r in dedupe_latest(_log(spark), "acct", "block").collect()
    }
    assert out == {1: 12.0, 2: 99.0}


def test_scd2_validity_ranges_and_time_travel(spark):
    scd2 = scd2_apply(_log(spark), "acct", "block")
    rows = {
        (r["acct"], r["valid_from"]): (r["valid_to"], r["is_current"])
        for r in scd2.collect()
    }
    assert rows[(1, 100)] == (200, False)
    assert rows[(1, 200)] == (300, False)
    assert rows[(1, 300)] == (None, True)
    assert rows[(2, 150)] == (None, True)

    at_250 = {
        r["acct"]: r["bal"] for r in snapshot_at(scd2, 250).collect()
    }
    assert at_250 == {1: 15.0, 2: 99.0}  # acct 1 as of block 250 = v200

    at_99 = snapshot_at(scd2, 99).count()
    assert at_99 == 0  # before first version: nothing visible


def test_scd2_current_equals_dedupe_latest(spark):
    scd2 = scd2_apply(_log(spark), "acct", "block")
    current = {
        r["acct"]: r["bal"]
        for r in scd2.filter(F.col("is_current")).collect()
    }
    latest = {
        r["acct"]: r["bal"]
        for r in dedupe_latest(_log(spark), "acct", "block").collect()
    }
    assert current == latest
