"""CDC / upsert / SCD2 emulation (no Delta/Iceberg jars in this image —
the MERGE semantics are composed from anti-join + union + window, the
standard lakehouse-less pattern).

Reference tie-in: the block DB is append-only and the state DB holds the
latest per-account state (api.rs BlockDB/State inputs). `merge_upsert`
is the state-DB update step; `scd2_apply` keeps the full block-versioned
history — together they reproduce "current state + provenance over block
ranges" that the reference's queries assume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from euclid_spark.catalog import cached_parquet


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE: rows in `updates` replace same-key rows in `target`; new
    keys are inserted. One anti-join (broadcastable when the update batch
    is small — the common CDC shape) + union."""
    kept = target.join(updates.select(key), on=key, how="left_anti")
    return kept.unionByName(updates)


def dedupe_latest(df: DataFrame, key: str, version_col: str) -> DataFrame:
    """Collapse a multi-version log to the latest row per key (highest
    version wins; deterministic via the version ordering)."""
    w = Window.partitionBy(key).orderBy(F.desc(version_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_apply(history: DataFrame, key: str, version_col: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: each row gets
    [valid_from, valid_to) from its own and the next version of the same
    key; the current row has valid_to = NULL. One window pass."""
    w = Window.partitionBy(key).orderBy(version_col)
    return (
        history.withColumn("valid_from", F.col(version_col))
        .withColumn("valid_to", F.lead(version_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def snapshot_at(scd2: DataFrame, version: int | str) -> DataFrame:
    """Time-travel read over an SCD2 table: the rows valid at `version` —
    the batch analog of querying the block DB at a block height."""
    v = F.lit(version)
    return scd2.filter(
        (F.col("valid_from") <= v)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > v))
    ).drop("valid_from", "valid_to", "is_current")


def cdc_scd2_time_travel(spark, sf_dir: str) -> DataFrame:
    """D9's registry face — BLOCK-HEIGHT TIME TRAVEL over an SCD2
    history (the reference's core read pattern: query the state DB as
    of a block; api.rs BlockDB/State): the events log is an
    (account, version=event_id, value) change stream; scd2_apply gives
    each version its [valid_from, valid_to) interval in ONE window
    pass, and the snapshot keeps the row valid at the as-of height —
    here the mid-range event id, computed as a broadcast one-row
    aggregate so the query is scale-invariant config, not a collected
    constant.

    Scale: one shuffle on the account key (the window), then a
    row-local interval filter — the history never shuffles again; at
    100 TB the SCD2 table is a stored artifact and time travel is the
    filter alone."""
    from pyspark.sql import SparkSession  # noqa: F401 (signature parity)

    ev = cached_parquet(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "value"
    )
    hist = scd2_apply(ev, "user_id", "event_id")
    asof = ev.agg(
        F.floor(F.max("event_id") / 2).cast("long").alias("as_of")
    )
    return (
        hist.join(F.broadcast(asof))
        .filter(
            (F.col("valid_from") <= F.col("as_of"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("as_of")))
        )
        .select("user_id", "as_of", "value", "valid_from", "valid_to")
    )


QUERIES = {"cdc_scd2_time_travel": cdc_scd2_time_travel}

ORACLES = {
    "cdc_scd2_time_travel": """
        WITH h AS (
            SELECT user_id, event_id AS valid_from, value,
                   LEAD(event_id) OVER (PARTITION BY user_id
                        ORDER BY event_id) AS valid_to
            FROM events
        ),
        v AS (SELECT CAST(FLOOR(MAX(event_id) / 2) AS BIGINT) AS as_of
              FROM events)
        SELECT user_id, as_of, value, valid_from, valid_to
        FROM h, v
        WHERE valid_from <= as_of
          AND (valid_to IS NULL OR valid_to > as_of)
    """
}
