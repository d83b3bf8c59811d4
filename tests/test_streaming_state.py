"""applyInPandasWithState: the per-user state stream's final state must
equal the batch-computed aggregate over the same data (state-DB
invariant: replaying the stream reconstructs the table)."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from euclid_spark.streaming.block_db import read_event_stream
from euclid_spark.streaming.state import user_state_stream
from tests.conftest import SF_SMOKE


@pytest.fixture()
def event_src(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "batch0.parquet")
    return str(src)


def test_user_state_matches_batch_aggregate(spark, event_src, tmp_path):
    stream = read_event_stream(spark, event_src)
    states = user_state_stream(stream.select("user_id", "event_id", "value"))
    q = (
        states.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_states")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # latest state per user (last update wins — single batch here)
    got = {
        r["user_id"]: (r["n_events"], r["last_event_id"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM user_states").collect()
    }

    from euclid_spark.catalog import load_events

    ev = load_events(spark, SF_SMOKE)
    expected = {
        r["user_id"]: (r["n"], r["last_id"], round(r["total"], 6))
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max("event_id").alias("last_id"),
            F.sum("value").alias("total"),
        )
        .collect()
    }
    assert got == expected
