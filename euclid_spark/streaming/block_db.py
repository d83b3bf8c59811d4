"""Streaming block-DB analog (SURVEY.md §2.A9 / §2.D4-D5).

The reference's block DB is an append-only IVC structure: every new block
is appended and the root commitment is updated incrementally
(mr-plonky2-circuits/src/block/mod.rs). The Spark-native equivalents:

- `windowed_event_counts`: Structured Streaming with watermark + windowed
  aggregation — the standing query over the append stream.
- `IncrementalDigest` via `foreachBatch`: each micro-batch folds its
  order-independent digest into a running chain commitment, idempotent by
  batch id — the IVC step function. Exactly-once holds ACROSS driver
  restarts when a `state_path` is given: the (last_batch_id, chain) pair
  is written atomically after each fold, so a micro-batch replayed from
  the checkpoint on restart is recognized and skipped. Without a
  state_path the guarantee is within-process only.

State stays O(windows) / O(1): the watermark bounds the agg state, the
chain folds to a single value.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from euclid_spark.functions.hashing import DIGEST_PRIME, digest_agg, digest_term

# events schema as stored in parquet (ts: microsecond TIMESTAMP_NTZ)
EVENTS_NS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over a directory of event parquet files; new
    files are discovered per micro-batch (the append-only ingest path)."""
    raw = (
        spark.readStream.schema(EVENTS_NS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(stream: DataFrame) -> DataFrame:
    """Watermarked 1-hour tumbling aggregation per event type."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@dataclass
class IncrementalDigest:
    """foreachBatch sink folding each micro-batch into a chain commitment.

    chain' = (chain + batch_digest) mod P — associative, so replays of the
    same batch id are skipped (idempotence) and the final chain equals the
    batch-computed digest of the full table.

    Durability: micro-batch ids from a given checkpoint are strictly
    increasing, so "applied" reduces to `batch_id <= last_batch_id`. With
    `state_path` set, that watermark plus the chain value is persisted
    write-to-temp-then-rename (atomic on POSIX) AFTER each fold and
    reloaded on construction — the replayed first batch after a driver
    restart is skipped instead of double-counted (ADVICE r1)."""

    chain: int = 0
    n_rows: int = 0
    last_batch_id: int = -1
    state_path: str | None = None

    def __post_init__(self) -> None:
        if self.state_path and os.path.exists(self.state_path):
            with open(self.state_path) as fh:
                st = json.load(fh)
            self.chain = st["chain"]
            self.n_rows = st["n_rows"]
            self.last_batch_id = st["last_batch_id"]

    def _save(self) -> None:
        if not self.state_path:
            return
        tmp = f"{self.state_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "chain": self.chain,
                    "n_rows": self.n_rows,
                    "last_batch_id": self.last_batch_id,
                },
                fh,
            )
        os.replace(tmp, self.state_path)

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id:
            return
        term = digest_term(
            F.col("event_id").cast("long"), F.col("user_id").cast("long")
        )
        row = batch_df.agg(
            digest_agg(term).alias("d"), F.count("*").alias("n")
        ).collect()[0]
        if row["n"]:
            self.chain = (self.chain + row["d"]) % DIGEST_PRIME
            self.n_rows += row["n"]
        self.last_batch_id = batch_id
        self._save()


def run_digest_chain(
    stream: DataFrame, checkpoint: str
) -> tuple[StreamingQuery, IncrementalDigest]:
    os.makedirs(checkpoint, exist_ok=True)
    sink = IncrementalDigest(state_path=os.path.join(checkpoint, "digest_state.json"))
    q = (
        stream.writeStream.foreachBatch(sink.process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q, sink
