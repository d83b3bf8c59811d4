"""Streamed epoch-shard maintenance (D34, r15): after any prefix of
batches — adversarial hash-split arrival order — the maintained
manifest must equal curation_epoch_shards evaluated from scratch over
everything ingested so far (the D20 batch ≡ incremental discipline),
and a replayed batch must be a no-op (watermark + anti-join)."""

from __future__ import annotations

import os

import pytest

from euclid_spark.operators.curation import (
    _manifest_from_assignments,
    _shard_assignments,
    EPOCH_SEED,
    SHARD_TOKENS,
)
from euclid_spark.streaming.shard_stream import StreamingShardIndex
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def split_docs(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pdf = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()[
        ["doc_id", "text"]
    ]
    # adversarial interleave: each batch spans the whole hash range
    for i in range(3):
        pdf.iloc[i::3].to_parquet(str(src / f"b{i}.parquet"), index=False)
    return str(src)


def test_streamed_manifest_tracks_batch_at_every_prefix(
    spark, tmp_path, split_docs
):
    sink = StreamingShardIndex(spark, str(tmp_path / "state"))
    seen = None
    for i, f in enumerate(sorted(os.listdir(split_docs))):
        batch = spark.read.parquet(os.path.join(split_docs, f))
        sink.process(batch, i)
        seen = batch if seen is None else seen.unionByName(batch)
        # batch reference over the seen prefix: the shared C55 bodies
        # evaluated from scratch at the sink's pinned bucket width
        from euclid_spark.operators.curation import (
            _assignments_from_rows,
            _shard_rows,
        )

        exp = _manifest_from_assignments(
            _assignments_from_rows(
                _shard_rows(seen, EPOCH_SEED, sink.bucket_hex),
                sink.bucket_hex,
                SHARD_TOKENS,
            )
        )
        assert _rows(sink.manifest()) == _rows(exp), f"diverged at batch {i}"


def test_streamed_manifest_equals_registry_face_at_quiescence(
    spark, tmp_path, split_docs
):
    """At quiescence the maintained manifest IS C55's output — the
    width-invariance property means the sink's pinned bucket_hex and
    the batch face's derived width cannot differ in result."""
    sink = StreamingShardIndex(spark, str(tmp_path / "state"))
    for i, f in enumerate(sorted(os.listdir(split_docs))):
        sink.process(spark.read.parquet(os.path.join(split_docs, f)), i)
    exp = _manifest_from_assignments(
        _shard_assignments(spark, SF_SMOKE, EPOCH_SEED, SHARD_TOKENS)
    )
    assert _rows(sink.manifest()) == _rows(exp)

    # replay with a stale watermark: anti-join keeps the store exact
    last = sorted(os.listdir(split_docs))[-1]
    sink.last_batch_id = 0
    sink.process(spark.read.parquet(os.path.join(split_docs, last)), 1)
    assert _rows(sink.manifest()) == _rows(exp)


def test_batch_appends_only_touched_buckets(spark, tmp_path, split_docs):
    """The incremental contract: processing a batch creates/extends
    only the bucket=K partition dirs its docs hash into, and file
    counts in untouched dirs do not change."""
    sink = StreamingShardIndex(spark, str(tmp_path / "state"))
    first = sorted(os.listdir(split_docs))[0]
    sink.process(spark.read.parquet(os.path.join(split_docs, first)), 0)

    def files_per_bucket():
        out = {}
        for d in os.listdir(sink.rows_path):
            if d.startswith("bucket="):
                out[d] = sorted(
                    f
                    for f in os.listdir(os.path.join(sink.rows_path, d))
                    if f.endswith(".parquet")
                )
        return out

    before = files_per_bucket()
    assert before  # the first batch created bucket dirs

    # a second batch: every pre-existing file is still there untouched
    second = sorted(os.listdir(split_docs))[1]
    sink.process(spark.read.parquet(os.path.join(split_docs, second)), 1)
    after = files_per_bucket()
    for d, fs in before.items():
        assert set(fs) <= set(after.get(d, [])), d
