"""Stream-static join: the streaming ingest enriched against a static
dimension (the CDC-style lookup every production pipeline needs). The
static side is re-read per micro-batch, so dimension updates are picked
up without restarting the query."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from euclid_spark.streaming.block_db import read_event_stream
from tests.conftest import SF_SMOKE


@pytest.fixture()
def event_src(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "batch0.parquet")
    return str(src)


def test_stream_static_enrichment_join(spark, event_src, tmp_path):
    stream = read_event_stream(spark, event_src)
    user_tier = spark.range(150).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 3 == 0, "gold").otherwise("basic").alias("tier"),
    )
    enriched = (
        stream.join(F.broadcast(user_tier), "user_id", "left")
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
    )
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tier_counts")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["tier"]: r["n"] for r in spark.sql("SELECT * FROM tier_counts").collect()
    }
    from euclid_spark.catalog import load_events

    ev = load_events(spark, SF_SMOKE)
    expected = {
        r["tier"]: r["n"]
        for r in ev.join(user_tier, "user_id", "left")
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected and sum(got.values()) == ev.count()
