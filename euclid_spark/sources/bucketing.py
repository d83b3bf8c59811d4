"""Bucketed table layout (SURVEY.md §6): pre-shuffle data once at write
time so every later join/aggregation on the bucket key is co-located —
no Exchange in the plan. At 100 TB this converts the per-query shuffle of
a fact-fact join (the dominant cost) into a one-time layout decision,
exactly how the reference pre-builds its storage DB keyed by mapping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Persist as a bucketed+sorted managed table keyed for co-located
    joins (sortBy enables sort-merge without a per-query sort)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two tables bucketed on the same key: Catalyst sees the
    matching output partitioning and elides both Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on=key)
