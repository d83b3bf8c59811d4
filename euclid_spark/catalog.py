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


def _utc_ns(date_str: str) -> int:
    """Exact integer nanoseconds since epoch for an ISO date/datetime."""
    import calendar
    import datetime as dt

    d = dt.datetime.fromisoformat(date_str)
    return calendar.timegm(d.timetuple()) * 10**9 + d.microsecond * 1000


def load_events(
    spark: SparkSession,
    sf_dir: str,
    t_min: str | None = None,
    t_max: str | None = None,
) -> DataFrame:
    """Load the events table, whose `ts` is a nanosecond parquet timestamp
    (unsupported by Spark's vectorized reader — read as int64 ns via the
    legacy conf, then converted to a microsecond TIMESTAMP).

    Range bounds are applied on the *raw int64* column BEFORE conversion:
    the predicate pushes down to the parquet scan (row-group min/max
    pruning), which is the block-range pruning of the reference's block DB
    — `ts`-as-integer is the "block number".
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if t_min is not None:
        df = df.filter(F.col("ts") >= F.lit(_utc_ns(t_min)))
    if t_max is not None:
        df = df.filter(F.col("ts") < F.lit(_utc_ns(t_max)))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a same-named temp view."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
