"""Streaming curation (D22): after every batch, the maintained curated
set must equal the batch composition — stratified sample ∩ repetition
keep ∩ uncontaminated ∩ dedup keep — evaluated from scratch over
everything ingested so far (same dedup family: the index's LSH pairs)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from euclid_spark.cache import release_all
from euclid_spark.operators.components import connected_components
from euclid_spark.operators.dedup import dedup_minhash_lsh
from euclid_spark.operators.textops import (
    BENCH_SOURCES,
    benchmark_shingles,
    contamination_overlap,
    repetition_stats,
    stratified_sample,
)
from euclid_spark.streaming.curation_stream import StreamingCuration
from tests.conftest import SF_SMOKE


def _batch_reference(spark, docs, pairs, bench, model):
    """The batch curation composition over `docs`, with the dedup
    keep-set from `pairs` (the index's LSH pair family) and the STATIC
    benchmark index `bench` + C61 model weights `model` — the streaming
    contract: the held-out eval suite and the trained classifier are
    both fixed up front, not discovered incrementally."""
    is_bench = F.col("source").isin(*BENCH_SOURCES)
    labels = connected_components(pairs)
    drop = labels.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    contaminated = (
        contamination_overlap(docs.filter(~is_bench), bench)
        .filter("contaminated")
        .select("doc_id")
    )
    from euclid_spark.operators.quality_model import model_verdicts
    from euclid_spark.operators.textops import safety_counts

    blocked = safety_counts(docs).filter("blocked").select("doc_id")
    mdl_drop = (
        model_verdicts(spark, docs, model)
        .filter(~F.col("model_keep"))
        .select("doc_id")
    )
    return (
        stratified_sample(docs)
        .filter(~is_bench)
        .join(repetition_stats(docs).filter("keep").select("doc_id"),
              "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .join(blocked, "doc_id", "left_anti")
        .join(mdl_drop, "doc_id", "left_anti")
        .join(drop, "doc_id", "left_anti")
    )


@pytest.fixture()
def split_docs(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pdf = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()[
        ["doc_id", "text", "lang", "source"]
    ]
    for i in range(3):
        pdf.iloc[i::3].to_parquet(str(src / f"b{i}.parquet"), index=False)
    return str(src)


def test_streamed_curation_tracks_batch_composition(spark, tmp_path, split_docs):
    corpus = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bench = benchmark_shingles(
        corpus.filter(F.col("source").isin(*BENCH_SOURCES))
    )
    from euclid_spark.operators.quality_model import quality_model_weights

    model = quality_model_weights(spark, SF_SMOKE)
    sink = StreamingCuration(spark, str(tmp_path / "state"), bench, model)

    seen = None
    for i, f in enumerate(sorted(os.listdir(split_docs))):
        batch = spark.read.parquet(os.path.join(split_docs, f))
        sink.process(batch, i)
        seen = batch if seen is None else seen.unionByName(batch)
        got = {tuple(r) for r in sink.kept().collect()}
        exp = {
            tuple(r)
            for r in _batch_reference(spark, seen, sink.index.pairs(), bench, model).collect()
        }
        release_all()
        assert got == exp, f"curated set diverged at batch {i}"

    # final check against the independent batch LSH pair computation
    final_pairs = dedup_minhash_lsh(spark, SF_SMOKE).select("doc_a", "doc_b")
    exp_final = {
        tuple(r)
        for r in _batch_reference(spark, corpus, final_pairs, bench, model).collect()
    }
    got_final = {tuple(r) for r in sink.kept().collect()}
    release_all()
    assert got_final == exp_final

    # replaying the last batch is a no-op for the curated set
    last = spark.read.parquet(
        os.path.join(split_docs, sorted(os.listdir(split_docs))[-1])
    )
    sink.last_batch_id = 1  # stale watermark: force a re-apply
    sink.process(last, 2)
    assert {tuple(r) for r in sink.kept().collect()} == got_final
    release_all()
