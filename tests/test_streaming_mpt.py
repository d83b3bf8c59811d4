"""Incremental MPT ingestion (SURVEY.md §2.D15): a SHUFFLED stream of
raw trie nodes, delivered one file per micro-batch, must reassemble
exactly the entries the batch walk produces — and nothing may resolve
early: a leaf whose ancestors haven't arrived waits in the frontier."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

from euclid_spark.cache import release_all
from euclid_spark.operators.mpt_ingest import (
    mpt_reassemble_query,
    synthesize_owner_tries,
)
from euclid_spark.streaming.mpt_stream import (
    read_node_stream,
    run_incremental_mpt,
)

N_FILES = 5


@pytest.fixture()
def node_feed(spark, tmp_path):
    """The synthesized node set written as N shuffled parquet files —
    parents and children scattered across micro-batches."""
    nodes = synthesize_owner_tries(spark, SF_SMOKE).toPandas()
    release_all()
    # deterministic shuffle that ignores tree structure: order by hash
    nodes = nodes.sort_values("node_hash", ignore_index=True)
    src = tmp_path / "feed"
    src.mkdir()
    per = (len(nodes) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        part = nodes.iloc[i * per : (i + 1) * per]
        if len(part):
            # flat single files (not Spark output directories): the
            # streaming file source lists files, not nested dirs
            part.to_parquet(str(src / f"p{i}.parquet"), index=False)
    return str(src), len(nodes)


def test_incremental_matches_batch(spark, tmp_path, node_feed):
    src, n_nodes = node_feed
    assert n_nodes > N_FILES, "need multiple nodes per file for the test"

    stream = read_node_stream(spark, src)
    q, sink = run_incremental_mpt(stream, str(tmp_path / "state"))
    q.awaitTermination(300)

    got = {
        (r["owner"], r["token_id"], r["value_hex"])
        for r in sink.entries().collect()
    }
    want = {
        (r["owner"], r["token_id"], r["value_hex"])
        for r in mpt_reassemble_query(spark, SF_SMOKE).collect()
    }
    release_all()
    assert got == want, (
        f"incremental != batch: missing={len(want - got)} extra={len(got - want)}"
    )
    # every trie completed → no cursor left waiting
    assert sink.pending().isEmpty()


def test_replayed_batch_is_skipped(spark, tmp_path, node_feed):
    src, _ = node_feed
    stream = read_node_stream(spark, src)
    q, sink = run_incremental_mpt(stream, str(tmp_path / "state"))
    q.awaitTermination(300)
    n = sink.entries().count()

    # a restart replays the last micro-batch from the checkpoint: the
    # watermark must skip it instead of double-appending entries
    last = spark.read.parquet(src).limit(50)
    sink.process(last, sink.last_batch_id)
    assert sink.entries().count() == n


def test_resent_root_does_not_duplicate(spark, tmp_path, node_feed):
    """A root node RE-SENT in a later micro-batch (new batch id, so the
    replay watermark does not apply) must not re-seed its walk cursor:
    the subtree is already in the node store, and a re-seeded cursor
    would re-emit every entry for that owner."""
    src, _ = node_feed
    stream = read_node_stream(spark, src)
    q, sink = run_incremental_mpt(stream, str(tmp_path / "state"))
    q.awaitTermination(300)
    n = sink.entries().count()
    assert n > 0

    roots = spark.read.parquet(src).filter("is_root")
    assert not roots.isEmpty()
    sink.process(roots, sink.last_batch_id + 1)
    assert sink.entries().count() == n, "re-sent roots re-emitted entries"
    assert sink.pending().isEmpty()
