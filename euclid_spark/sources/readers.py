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


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC carries its schema; predicate pushdown works like parquet."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line (`value` string) — the raw-corpus ingest shape
    (a crawl dump of one document per line feeds the documents table)."""
    return spark.read.text(path)


def write_text_lines(df: DataFrame, col: str, path: str) -> None:
    df.select(F.col(col).cast("string").alias("value")).write.mode(
        "overwrite"
    ).text(path)
