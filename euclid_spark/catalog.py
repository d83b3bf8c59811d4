"""Catalog: load a scale-factor directory of parquet tables and register
them as temp views.

The reference's "preprocessing" phase materializes three databases
(storage / state / block — mr-plonky2-circuits/src/api.rs:49-68); here the
analogous catalog is a set of columnar parquet tables. Parquet scans give
Catalyst predicate pushdown + column pruning for free, which is the
scale-path equivalent of the reference's key-addressed Merkle lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame keyed by name."""
    dfs = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES if t != "events"}
    dfs["events"] = load_events(spark, sf_dir)
    return dfs


def _ntz_lit(date_str: str):
    """TIMESTAMP_NTZ literal from an ISO date/datetime string — compared
    against the stored `ts` column as naive wall time, no zone shifts
    (a Python-datetime literal would be interpreted in the JVM's local
    zone; the string→NTZ cast is zone-independent)."""
    return F.lit(date_str).cast("timestamp_ntz")


def load_events(
    spark: SparkSession,
    sf_dir: str,
    t_min: str | None = None,
    t_max: str | None = None,
) -> DataFrame:
    """Load the events table. `ts` is stored as a microsecond
    TIMESTAMP_NTZ parquet column (naive UTC wall time).

    Range bounds are applied on the stored column BEFORE any conversion:
    timestamp min/max predicates push down to the parquet scan
    (row-group pruning), which is the block-range pruning of the
    reference's block DB — `ts` is the "block number".

    The returned `ts` is cast to the session-zoned TIMESTAMP type; every
    session this engine builds pins spark.sql.session.timeZone=UTC
    (session.py / registry.py), so the cast is instant-preserving and
    date_trunc/window semantics match the UTC-naive DuckDB oracles.
    """
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if t_min is not None:
        df = df.filter(F.col("ts") >= _ntz_lit(t_min))
    if t_max is not None:
        df = df.filter(F.col("ts") < _ntz_lit(t_max))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a same-named temp view."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
