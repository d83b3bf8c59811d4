"""Source/sink tests (SURVEY.md §2.D2-D3): partitioned parquet layout with
partition pruning, csv/json round-trips with explicit schemas."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.catalog import load_events
from euclid_spark.sources.readers import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_partitioned_by_day,
)
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load_events(spark, SF_SMOKE)
    write_partitioned_by_day(ev, "ts", out)

    pruned = spark.read.parquet(out).filter(F.col("day") == "2024-01-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() > 0
    # partition filter must reach the scan (directory pruning, not a row filter)
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:200]


def test_csv_roundtrip(spark, tmp_path):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    path = str(tmp_path / "cust_csv")
    write_csv(cust, path)
    back = read_csv(spark, path, cust.schema)
    assert back.count() == cust.count()
    assert {f.name for f in back.schema.fields} == {f.name for f in cust.schema.fields}


def test_json_roundtrip(spark, tmp_path):
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    path = str(tmp_path / "nation_json")
    write_json(nat, path)
    back = read_json(spark, path, nat.schema)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nat.collect()
    )
