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
