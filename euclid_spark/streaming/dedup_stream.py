"""Incremental dedup-index maintenance (SURVEY.md §2.D21).

The production problem: a training-data pipeline ingests documents
continuously, and every NEW document must be checked for near-duplicates
against the ENTIRE historical corpus — without recomputing the corpus's
signatures per batch. This is the dedup analog of the reference's IVC
block DB (block/mod.rs: append, never recompute), applied to C2's
MinHash/LSH index:

- persistent state between batches (parquet on disk):
    sigs/   — per-doc MinHash signatures ingested so far (append-only;
              (doc_id) unique — the INDEX, the expensive part)
    pairs/  — candidate near-dup pairs found so far (append-only)
- per micro-batch: signatures are computed for the BATCH ONLY
  (shingle → md5 → k MIN aggs over the new docs alone), appended to the
  store, and new candidate pairs come from ONE bucket join:
  batch bands ⋈ (store ∪ batch) bands — every pair with at least one
  new side. Old×old pairs were found when their younger member arrived
  (induction), so the union of per-batch pair sets equals the batch
  LSH pair set over the full corpus
  (tests/test_streaming_dedup.py proves equality on a 3-way split and
  idempotence under batch replay).

Skew guard: the MAX_BUCKET cap applies to the CURRENT bucket size at
join time (count over store ∪ batch), so a bucket that grows past the
cap stops emitting new pairs from then on — at-most the batch semantics
(batch mode drops the whole oversized bucket retroactively). The
equality test runs under-cap; the guard's purpose is identical in both
modes: no m² blowup from a degenerate bucket.

Exactly-once across restarts: the IncrementalDigest watermark pattern
(batch id, atomic temp+rename after the batch's stores are updated);
re-delivered docs are anti-joined against the signature store, so even
a partially-applied crash window cannot double-insert a signature or
re-emit its pairs.

Scale shape: per batch, signature cost ∝ batch size (the corpus is
never re-shingled); the candidate join is bucket-equi on
(band_idx, band_val) with the batch side small — a classic
small-probe ⋈ big-store join AQE plans as broadcast when the batch is
tiny. The pair anti-join keys on (doc_a, doc_b) — the same shuffle key
the join just produced."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from euclid_spark.cache import local_checkpoint_tracked, release_checkpoints
from euclid_spark.operators.dedup import (
    MAX_BUCKET,
    N_HASHES,
    band_table,
    minhash_signatures,
)

SIGS_SCHEMA = "doc_id long, " + ", ".join(f"sig{s} string" for s in range(N_HASHES))
PAIRS_SCHEMA = "doc_a long, doc_b long"
DOCS_SCHEMA = "doc_id long, text string"


def read_document_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over a directory of (doc_id, text) parquet
    files — the ingest feed stand-in."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


class IncrementalDedupIndex:
    """foreachBatch sink maintaining the MinHash/LSH index and the
    candidate-pair ledger (module docstring has the algorithm)."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.sigs_path = os.path.join(state_dir, "sigs")
        self.pairs_path = os.path.join(state_dir, "pairs")
        self.meta_path = os.path.join(state_dir, "meta.json")
        os.makedirs(state_dir, exist_ok=True)
        self._owner = f"dedup_stream:{id(self)}"
        self.last_batch_id = -1
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as fh:
                self.last_batch_id = json.load(fh)["last_batch_id"]

    def _save_meta(self) -> None:
        tmp = f"{self.meta_path}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"last_batch_id": self.last_batch_id}, fh)
        os.replace(tmp, self.meta_path)

    def _read_or_empty(self, path: str, schema: str) -> DataFrame:
        if os.path.exists(path):
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.createDataFrame([], schema)

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id:
            return  # checkpoint replay after restart — already applied
        store = self._read_or_empty(self.sigs_path, SIGS_SCHEMA)

        # signatures for the batch only; re-delivered docs (replayed
        # file, crash window) are already indexed — skip them entirely,
        # their pairs were emitted when they first arrived
        new_sigs = local_checkpoint_tracked(
            minhash_signatures(batch_df).join(
                store.select("doc_id"), "doc_id", "left_anti"
            ),
            owner=self._owner,
        )
        if new_sigs.isEmpty():
            self.last_batch_id = batch_id
            self._save_meta()
            release_checkpoints(self._owner)
            return
        new_sigs.write.mode("append").parquet(self.sigs_path)

        # ONE bucket join: new bands probe the full index (store ∪ new).
        # The bucket-size guard counts the CURRENT bucket population —
        # same window-over-join-key shape as the batch operator.
        from pyspark.sql import Window

        all_bands = band_table(
            self.spark.read.schema(SIGS_SCHEMA).parquet(self.sigs_path)
        )
        wb = Window.partitionBy("band_idx", "band_val")
        all_bands = all_bands.withColumn("bucket_n", F.count("*").over(wb)).filter(
            F.col("bucket_n") <= MAX_BUCKET
        )
        new_bands = band_table(new_sigs)
        cand = (
            new_bands.alias("n")
            .join(
                all_bands.alias("a"),
                (F.col("n.band_idx") == F.col("a.band_idx"))
                & (F.col("n.band_val") == F.col("a.band_val"))
                & (F.col("n.doc_id") != F.col("a.doc_id")),
            )
            .select(
                F.least(F.col("n.doc_id"), F.col("a.doc_id")).alias("doc_a"),
                F.greatest(F.col("n.doc_id"), F.col("a.doc_id")).alias("doc_b"),
            )
            .distinct()
        )
        # a pair can re-collide in a later batch through another band —
        # the ledger keeps each pair once
        new_pairs = local_checkpoint_tracked(
            cand.join(
                self._read_or_empty(self.pairs_path, PAIRS_SCHEMA),
                ["doc_a", "doc_b"],
                "left_anti",
            ),
            owner=self._owner,
        )
        if not new_pairs.isEmpty():
            new_pairs.write.mode("append").parquet(self.pairs_path)

        self.last_batch_id = batch_id
        self._save_meta()
        release_checkpoints(self._owner)

    def pairs(self) -> DataFrame:
        return self._read_or_empty(self.pairs_path, PAIRS_SCHEMA)

    def signatures(self) -> DataFrame:
        return self._read_or_empty(self.sigs_path, SIGS_SCHEMA)


def run_incremental_dedup(
    stream: DataFrame, state_dir: str
) -> tuple[StreamingQuery, IncrementalDedupIndex]:
    """Attach the incremental dedup index to a streaming documents frame."""
    ck = os.path.join(state_dir, "_checkpoint")
    os.makedirs(ck, exist_ok=True)
    sink = IncrementalDedupIndex(stream.sparkSession, state_dir)
    q = (
        stream.writeStream.foreachBatch(sink.process)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    return q, sink
