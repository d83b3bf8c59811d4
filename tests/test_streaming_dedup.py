"""Incremental dedup-index maintenance (D21): after all batches land,
the streamed pair ledger must equal the batch MinHash/LSH pair set over
the full corpus; signatures are computed once per doc; a replayed batch
is a no-op."""

from __future__ import annotations

import pytest

from euclid_spark.cache import release_all
from euclid_spark.operators.dedup import dedup_minhash_lsh
from euclid_spark.streaming.dedup_stream import (
    IncrementalDedupIndex,
    read_document_stream,
    run_incremental_dedup,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def split_docs(spark, tmp_path):
    """The smoke corpus split into 3 ingest files (round-robin, so every
    batch mixes early and late doc_ids — the adversarial order)."""
    src = tmp_path / "src"
    src.mkdir()
    pdf = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()[
        ["doc_id", "text"]
    ]
    for i in range(3):
        pdf.iloc[i::3].to_parquet(str(src / f"b{i}.parquet"), index=False)
    return str(src)


def test_streamed_pairs_equal_batch_lsh(spark, tmp_path, split_docs):
    q, sink = run_incremental_dedup(
        read_document_stream(spark, split_docs), str(tmp_path / "state")
    )
    q.awaitTermination(300)
    assert sink.last_batch_id >= 2

    got = {(r["doc_a"], r["doc_b"]) for r in sink.pairs().collect()}
    exp = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    release_all()
    assert got == exp

    # one signature row per corpus doc — the index never re-shingles
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sink.signatures().count() == n_docs


def test_replayed_batch_is_noop(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    sink = IncrementalDedupIndex(spark, str(tmp_path / "state"))
    sink.process(docs, 0)
    sigs0 = sink.signatures().count()
    pairs0 = {(r["doc_a"], r["doc_b"]) for r in sink.pairs().collect()}

    sink.process(docs, 0)  # same id: watermark fast path
    # stale watermark + re-delivered docs: the anti-join dedups
    sink.last_batch_id = -1
    sink.process(docs, 1)

    assert sink.signatures().count() == sigs0
    assert {(r["doc_a"], r["doc_b"]) for r in sink.pairs().collect()} == pairs0
