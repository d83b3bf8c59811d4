"""Stream-stream join (SURVEY.md §2.D13) — the block-DB ingest shape
where two append-only feeds must be correlated: e.g. extraction proofs
arriving on one stream and block headers on another, joined within a
bounded event-time window (the reference pairs storage proofs with their
block in `state/block_linking`; in a streaming deployment both sides are
late-arriving).

Spark semantics: both sides watermarked; the join condition carries an
explicit event-time range so state for unmatched rows is BOUNDED — rows
older than (watermark − range) are evicted. Without the time-range
predicate Spark must keep every row forever; with it, state is
O(rate × window), independent of stream lifetime — the property that
matters at 100 TB/day ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_clicks(events: DataFrame, window_minutes: int = 30) -> DataFrame:
    """Join each purchase to same-user clicks at most `window_minutes`
    BEFORE it (attribution). Both sides derive from the watermarked
    event stream; the time-range predicate bounds both join states."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")),
        "inner",
    ).select("purchase_id", "click_id", "p_user", "p_ts", "c_ts", "p_value")
