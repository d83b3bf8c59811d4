"""Stream-stream join (SURVEY §2.D13): watermarked two-stream join with
a time-range condition; result must equal the equivalent batch join."""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from euclid_spark.streaming.block_db import read_event_stream
from euclid_spark.streaming.joins import purchases_with_clicks
from tests.conftest import SF_SMOKE


@pytest.fixture()
def event_src(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for f in glob.glob(f"{SF_SMOKE}/events.parquet"):
        shutil.copy(f, src / "batch0.parquet")
    return str(src)


def test_stream_stream_join_matches_batch(spark, tmp_path, event_src):
    stream = read_event_stream(spark, event_src)
    joined = purchases_with_clicks(stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssjoin").collect()
    }

    from euclid_spark.catalog import load_events

    # same plan on the batch table (withWatermark is a no-op in batch)
    expect = {
        (r["purchase_id"], r["click_id"])
        for r in purchases_with_clicks(load_events(spark, SF_SMOKE)).collect()
    }
    assert got == expect
    assert len(got) > 0
