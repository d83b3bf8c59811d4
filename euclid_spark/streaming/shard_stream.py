"""Streamed epoch-shard maintenance (SURVEY.md §2.D34, r15 — VERDICT
r14 #5): C55's epoch-shuffle shard manifest maintained INCREMENTALLY
as the corpus grows, instead of a from-scratch recompute per corpus
version.

Why this is the right incremental shape: a new document lands at one
position of the seeded-hash order (md5(seed:doc_id) is independent of
arrival time), shifting start_tok only for documents that hash AFTER
it — so any doc-level materialization of start_tok/shard_id would be
rewritten corpus-wide per batch. What IS stable under appends is the
bucket-keyed doc row (doc_id, key, n_tokens, bucket): a pure per-doc
function of the document itself. The sink therefore maintains exactly
that — the C55 ingest step's rows, Hive-partitioned by the hash-prefix
`bucket` — and a batch APPENDS only to the bucket directories its docs
hash into (typically all buckets at production batch sizes, but each
append is batch-sized, never corpus-sized; nothing is rewritten).
`manifest()` then runs C55's two-level prefix sum + rollup
(_assignments_from_rows → _manifest_from_assignments, the shared
bodies) over the maintained store: an aggregation-only pass over
pre-tokenized rows — the per-doc work (lowercase, regex tokenize, md5)
is paid ONCE per document at ingest, which is the point: at 100 TB the
tokenize+hash scan dominates the manifest recompute by orders of
magnitude, and the maintained store amortizes it across corpus
versions.

Parity (the D20 discipline, tests/test_streaming_shards.py): after any
prefix of batches — in adversarial arrival order — `manifest()` equals
curation_epoch_shards evaluated over everything ingested so far,
because the store's rows are EXACTLY the rows the batch pipeline's
ingest step derives (shared code), and the manifest is a deterministic
function of that row set. At quiescence the registry face's oracle is
therefore C55's own batch SQL (faces.py `stream_epoch_shards`).

Exactly-once: batch-id watermark in meta.json + doc_id anti-join
against the store before append — a replayed batch adds nothing.

The bucket WIDTH is pinned at index creation (it partitions the
store's directory layout, so it cannot drift mid-stream); C55's
result is bucket-width-invariant (property-tested), so the pinned
width never changes the manifest, only the layout granularity.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from euclid_spark.operators.curation import (
    EPOCH_SEED,
    SHARD_TOKENS,
    _assignments_from_rows,
    _manifest_from_assignments,
    _shard_rows,
)

SHARD_DOCS_SCHEMA = "doc_id long, text string"
_ROWS_SCHEMA = "doc_id long, key string, n_tokens long, bucket long"


class StreamingShardIndex:
    """foreachBatch sink maintaining the bucket-partitioned shard-row
    store (module docstring)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        seed: str = EPOCH_SEED,
        shard_tokens: int = SHARD_TOKENS,
        bucket_hex: int = 2,
    ) -> None:
        self.spark = spark
        self.rows_path = os.path.join(state_dir, "rows")
        self.meta_path = os.path.join(state_dir, "meta.json")
        self.seed = seed
        self.shard_tokens = shard_tokens
        self.bucket_hex = bucket_hex
        os.makedirs(state_dir, exist_ok=True)
        self.last_batch_id = -1
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as fh:
                self.last_batch_id = json.load(fh)["last_batch_id"]

    def _save_meta(self) -> None:
        tmp = f"{self.meta_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"last_batch_id": self.last_batch_id}, fh)
        os.replace(tmp, self.meta_path)

    def _store(self) -> DataFrame:
        if os.path.exists(self.rows_path):
            # partition column `bucket` comes back from the Hive layout;
            # basePath keeps it a column, schema pins the value types
            return (
                self.spark.read.option("basePath", self.rows_path)
                .schema(_ROWS_SCHEMA)
                .parquet(self.rows_path)
            )
        return self.spark.createDataFrame([], _ROWS_SCHEMA)

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id:
            return  # replay of an applied batch
        rows = _shard_rows(
            batch_df.select("doc_id", "text"), self.seed, self.bucket_hex
        )
        new = rows.join(self._store(), "doc_id", "left_anti")
        if not new.isEmpty():
            # append ONLY the bucket=K dirs this batch touches
            new.write.mode("append").partitionBy("bucket").parquet(
                self.rows_path
            )
        self.last_batch_id = batch_id
        self._save_meta()

    def manifest(self) -> DataFrame:
        """The CURRENT epoch-shard manifest over everything ingested:
        C55's shared cut + rollup over the maintained rows. Reading
        one bucket's docs is a partition-pruned scan (`bucket=K`
        dirs) — the same locality the two-level prefix sum keys on."""
        return _manifest_from_assignments(
            _assignments_from_rows(
                self._store(), self.bucket_hex, self.shard_tokens
            )
        )


def run_streaming_shards(
    stream: DataFrame,
    state_dir: str,
    seed: str = EPOCH_SEED,
    shard_tokens: int = SHARD_TOKENS,
) -> "tuple[StreamingQuery, StreamingShardIndex]":
    """Attach the shard-index sink to a streaming documents frame
    (schema SHARD_DOCS_SCHEMA)."""
    ck = os.path.join(state_dir, "_checkpoint")
    os.makedirs(ck, exist_ok=True)
    sink = StreamingShardIndex(
        stream.sparkSession, state_dir, seed, shard_tokens
    )
    q = (
        stream.writeStream.foreachBatch(sink.process)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    return q, sink
