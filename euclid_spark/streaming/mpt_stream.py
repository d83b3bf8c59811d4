"""Incremental (streaming) MPT ingestion — SURVEY.md §2.D15.

The reference's block DB is IVC: each block's proof set is APPENDED and
the database commitment advances incrementally
(mr-plonky2-circuits/src/block/mod.rs); nothing is recomputed from
genesis. The batch path here (operators/mpt_ingest.py) reassembles
tries from a complete node set; this module is the append analog: trie
nodes arrive in micro-batches, IN ANY ORDER, and entries are emitted as
soon as their root→leaf path is complete.

Algorithm (incremental level-synchronous walk):

- persistent state between batches, all parquet on disk:
    nodes/    — decoded typed nodes ingested so far (append-only,
                (owner, node_hash) unique)
    frontier/ — pending cursors (owner, node_hash, prefix): tree
                positions whose node bytes have NOT arrived yet
                (snapshot, rewritten per batch)
    entries/  — resolved (owner, token_id, value_hex) (append-only)
- per micro-batch: decode the new nodes, merge them into the store,
  seed new roots as cursors, then walk: a cursor that finds its node
  either emits (leaf / valued branch) or expands into child cursors;
  a cursor whose node is still missing parks in frontier/ and is
  retried next batch. The walk is the shared multi-level-batched
  engine (operators/mpt_ingest.walk_tries, park_missing mode) — a
  newly-arrived node can unblock a whole subtree at once.

Equivalences that make this correct under reordering: node rows are
content-addressed ((owner, node_hash) keys), so arrival order is
irrelevant; a cursor is created exactly once (when its parent resolves,
or at root arrival) and consumed exactly once (when its node is
present); hence every complete path emits exactly once, and after all
nodes have arrived the entries store equals the batch
`mpt_reassemble` output (tests/test_streaming_mpt.py proves this on a
shuffled 1-node-per-trigger feed).

Exactly-once across restarts follows the IncrementalDigest pattern
(streaming/block_db.py): micro-batch ids from one checkpoint are
strictly increasing, so a JSON watermark (batch_id, written atomically
via temp+rename AFTER the batch's stores are updated) lets a replayed
batch be skipped instead of double-applied.

Scale shape: per batch, cost is (new nodes decoded) + (frontier ⋈
node-store joins, shuffle-partitioned on (owner, node_hash)) — the
frontier is bounded by the arrival gap (cursors waiting on missing
nodes), NOT the corpus; the node store is the only corpus-sized side
and it arrives pre-partitioned on the join key. Walk state is
checkpointed once per multi-level round (walk_tries) — lineage would
otherwise nest per trie level (operators/components.py failure mode)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from euclid_spark.cache import local_checkpoint_tracked, release_checkpoints
from euclid_spark.operators.mpt_ingest import (
    NODE_SCHEMA,
    decode_mpt_nodes,
    walk_tries,
    _nibbles_to_hex,
)

FRONTIER_SCHEMA = "owner long, node_hash string, prefix array<int>"
ENTRIES_SCHEMA = "owner long, token_id long, value_hex string"


def read_node_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over a directory of raw-node parquet files —
    the eth_getProof / snapshot-sync feed stand-in."""
    return (
        spark.readStream.schema(NODE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


class IncrementalMptReassembly:
    """foreachBatch sink: raw trie-node micro-batches → incrementally
    reassembled mapping entries (module docstring has the algorithm)."""

    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.nodes_path = os.path.join(state_dir, "nodes")
        self.frontier_path = os.path.join(state_dir, "frontier")
        self.entries_path = os.path.join(state_dir, "entries")
        self.meta_path = os.path.join(state_dir, "meta.json")
        os.makedirs(state_dir, exist_ok=True)
        # checkpoint owner key: this sink runs on a streaming-query
        # thread, concurrently with other queries — it must release only
        # its OWN pinned RDDs (cache.py owner scoping, ADVICE r4)
        self._owner = f"mpt_stream:{id(self)}"
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
        store_existing = self._read_or_empty(
            self.nodes_path,
            "owner long, node_hash string, node_type string, path array<int>, "
            "value binary, children array<struct<idx:int, child:string>>",
        )
        # content-addressed upsert: a node re-sent in a later batch (or a
        # replayed file) must not duplicate its (owner, node_hash) row —
        # the walk joins would fan out duplicate entries
        dec_new = (
            decode_mpt_nodes(batch_df)
            .join(
                store_existing.select("owner", "node_hash"),
                ["owner", "node_hash"],
                "left_anti",
            )
        )
        dec_new = local_checkpoint_tracked(dec_new, owner=self._owner)
        if not dec_new.isEmpty():
            dec_new.write.mode("append").parquet(self.nodes_path)
        # re-read AFTER append so this batch's nodes are visible to the walk
        store = (
            self.spark.read.parquet(self.nodes_path)
            if os.path.exists(self.nodes_path)
            else store_existing
        )

        # A root seeds a walk cursor only on FIRST arrival: a root node
        # re-sent in a later micro-batch (or a replayed file) is already
        # in the node store, and re-seeding its cursor would walk the
        # whole stored subtree again and append duplicate entries.
        # Anti-joining against the PRE-batch store is the ledger — the
        # root's bytes can only ever have been ingested root-tagged
        # (an MPT root is never any node's child), so presence in the
        # store means its cursor was already seeded.
        new_roots = (
            batch_df.filter("is_root")
            .select(
                "owner",
                "node_hash",
                F.expr("CAST(array() AS array<int>)").alias("prefix"),
            )
            .join(
                store_existing.select("owner", "node_hash"),
                ["owner", "node_hash"],
                "left_anti",
            )
        )
        active = local_checkpoint_tracked(
            self._read_or_empty(self.frontier_path, FRONTIER_SCHEMA)
            .unionByName(new_roots)
            .dropDuplicates(["owner", "node_hash", "prefix"]),
            owner=self._owner,
        )

        # the walk itself is the shared multi-level-batched engine
        # (operators/mpt_ingest.walk_tries): park_missing returns cursors
        # whose node has not arrived yet — the next batch's frontier.
        # The store cache is batch-scoped: persist here, unpersist after
        # the writes (walk_tries's release_all-tracked persist would
        # accumulate across micro-batches).
        store = store.persist()
        out, frontier = walk_tries(
            store,
            active,
            park_missing=True,
            ckpt_owner=self._owner,
            persist_nodes=False,
        )
        ent = out.select(
            "owner",
            F.conv(_nibbles_to_hex(F.col("key_nibbles")), 16, 10)
            .cast("long")
            .alias("token_id"),
            F.lower(F.hex("value")).alias("value_hex"),
        )
        ent = local_checkpoint_tracked(ent, owner=self._owner)
        if not ent.isEmpty():
            ent.write.mode("append").parquet(self.entries_path)

        # walk_tries returned round-checkpointed slices — pin the union
        # so overwriting the directory it was read from is safe
        frontier = local_checkpoint_tracked(frontier, owner=self._owner)
        frontier.write.mode("overwrite").parquet(self.frontier_path)

        self.last_batch_id = batch_id
        self._save_meta()
        # this batch's pinned temporaries (decoded nodes, walk frontiers,
        # emit frames) are all flushed to parquet above — release their
        # checkpoint RDDs instead of stranding them for the session life.
        # Owner-scoped: a concurrent query's still-needed checkpoints are
        # untouched (truncated lineage cannot be recomputed).
        store.unpersist()
        release_checkpoints(self._owner)

    def entries(self) -> DataFrame:
        return self._read_or_empty(self.entries_path, ENTRIES_SCHEMA)

    def pending(self) -> DataFrame:
        return self._read_or_empty(self.frontier_path, FRONTIER_SCHEMA)


def run_incremental_mpt(
    stream: DataFrame, state_dir: str
) -> tuple[StreamingQuery, IncrementalMptReassembly]:
    """Drive a raw-node stream through the incremental reassembler with
    an availableNow trigger (drain-what-is-there semantics)."""
    sink = IncrementalMptReassembly(stream.sparkSession, state_dir)
    q = (
        stream.writeStream.foreachBatch(sink.process)
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    return q, sink
