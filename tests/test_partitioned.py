"""Day-partitioned layout (D18): the range predicate must become a
PartitionFilter (pruned directories never read), and the pruned scan
must return exactly what the unpartitioned filter returns."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from euclid_spark.sources.partitioned import (
    read_events_range,
    write_events_partitioned,
)
from tests.conftest import SF_SMOKE

DAY_FROM, DAY_TO = "2024-01-03", "2024-01-06"


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_by_day"))
    write_events_partitioned(spark, SF_SMOKE, d)
    return d


def test_plan_has_partition_filters(spark, part_dir):
    df = read_events_range(spark, part_dir, DAY_FROM, DAY_TO)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the day predicates must be partition filters, not data filters
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in seg, f"day predicate not in PartitionFilters: {seg}"


def _files_read(df) -> int:
    """The scan's post-pruning numFiles metric (inputFiles() reports the
    relation's full listing — it ignores partition pruning). Drives THIS
    DataFrame's own physical plan (df.count() would build a separate
    query execution and leave these metrics untouched)."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    scan = qe.executedPlan().collectLeaves().apply(0)
    return int(scan.metrics().apply("numFiles").value())


def test_pruning_reads_fewer_files(spark, part_dir):
    whole = _files_read(spark.read.parquet(part_dir))
    pruned = _files_read(read_events_range(spark, part_dir, DAY_FROM, DAY_TO))
    assert 0 < pruned < whole, f"no pruning: {pruned} of {whole} files read"
    assert pruned == 3  # one file per day in the range


def test_pruned_scan_matches_unpartitioned(spark, part_dir):
    base = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("day", F.to_date("ts"))
        .filter((F.col("day") >= DAY_FROM) & (F.col("day") < DAY_TO))
    )
    got = read_events_range(spark, part_dir, DAY_FROM, DAY_TO)
    assert got.count() == base.count() > 0
    a = {r["event_id"] for r in got.select("event_id").collect()}
    b = {r["event_id"] for r in base.select("event_id").collect()}
    assert a == b


def test_face_scan_proportional_to_range(spark, tmp_path, monkeypatch):
    """The GATED face (r7): its executed scan must read exactly the
    days in [T_MIN, T_MAX) — the 'scan ∝ range width' claim checked on
    the same plan the driver's oracle gate runs, not a side harness."""
    from euclid_spark.operators.euclid import T_MAX, T_MIN
    from euclid_spark.sources.partitioned import day_partitioned_range

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    df = day_partitioned_range(spark, SF_SMOKE)
    n_days = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(F.to_date("ts").alias("d"))
        .filter((F.col("d") >= T_MIN) & (F.col("d") < T_MAX))
        .distinct()
        .count()
    )
    total_days = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(F.to_date("ts")).distinct().count()
    )
    files = _files_read(df)
    assert files == n_days, f"read {files} files for {n_days} days in range"
    assert n_days < total_days  # the range is a strict subset
