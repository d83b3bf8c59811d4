"""Streaming session_window: the native gap-session aggregation over the
event stream (batch twin: rel_sessionize). Session counts per user must
match the batch lag+cumsum implementation."""

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


def test_session_window_matches_batch_sessionize(spark, event_src, tmp_path):
    stream = read_event_stream(spark, event_src)
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        sessions.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["user_id"]: r["n"]
        for r in spark.sql(
            "SELECT user_id, count(*) AS n FROM stream_sessions GROUP BY user_id"
        ).collect()
    }

    from euclid_spark.operators.relational import sessionize

    expected = {
        r["user_id"]: r["n"]
        for r in sessionize(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected
