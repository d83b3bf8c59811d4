"""Source/sink helpers (SURVEY.md §2.D).

Explicit schemas everywhere (no runtime inference scans), and a
partitioned-parquet writer that lays data out by its range key — the
storage-side half of the reference's block-range pruning: queries with a
day predicate read only matching partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_partitioned_by_day(df: DataFrame, ts_col: str, out_dir: str) -> None:
    """Write partitioned by the day of `ts_col` — partition pruning makes
    day-range scans touch only matching directories."""
    (
        df.withColumn("day", F.to_date(ts_col))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out_dir)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", True).csv(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)
