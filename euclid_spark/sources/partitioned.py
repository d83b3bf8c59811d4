"""Day-partitioned event layout (SURVEY.md §6 / §2.D18) — the physical
layout the 100 TB sizing worksheet assumes.

The reference's whole query model is block-range scoped (every proof
carries [B_min, B_max]); at scale that only works if a range query
READS only its range. Hive-style partitioning on the derived day column
turns the events directory into one subdirectory per day, and a filter
on `day` becomes a PartitionFilter: pruned directories are never listed,
never opened — scan cost ∝ range width, not corpus size. (Locally the
unpartitioned reads get row-group pruning via PushedFilters on ts; the
partitioned layout is the stronger guarantee: whole files skipped, and
`ts`-derived predicates still push down WITHIN each day's files.)

tests/test_partitioned.py asserts the plan carries a non-empty
PartitionFilters for the range query, that pruning reads strictly fewer
files, and that results equal the unpartitioned scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_partitioned(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """events → parquet partitioned by event day (one directory per
    day; Hive-style `day=YYYY-MM-DD` paths). At 100 TB add a coarser
    top level (month) if the file count per listing matters."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("day", F.to_date("ts"))
    ev.write.mode("overwrite").partitionBy("day").parquet(out_dir)


def read_events_range(
    spark: SparkSession, part_dir: str, day_from: str, day_to: str
) -> DataFrame:
    """Range scan over the partitioned layout: the `day` predicate is a
    PARTITION filter (directory pruning), not just a row-group one."""
    ev = spark.read.parquet(part_dir)
    return ev.filter((F.col("day") >= day_from) & (F.col("day") < day_to))
