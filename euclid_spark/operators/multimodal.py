"""Multimodal column plumbing (SURVEY.md §2.C11).

Pattern for 100 TB multimodal corpora: media lives in opaque `binary`
columns beside typed metadata; decode / feature-extraction runs as
Arrow-batched `mapInPandas` so each task streams record batches without
materializing a partition, and the pre-decode projection prunes to only
the columns the extractor needs.

The container has no image/audio codecs, so `decode_real` is an explicit
NotImplementedError stub; `FAKE_FEATURES` is the deterministic stand-in
that keeps the Spark-side plumbing (schema, batching, partitioning) real
and testable. Swap `_extract` for a real decoder without touching the
plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, payload_md5 string, "
    "f_mean double, f_head double, f_tail double, f_spread double"
)


def decode_real(payload: bytes) -> bytes:  # pragma: no cover - documented stub
    """Real media decode (PIL/librosa/ffmpeg) — not available in this
    environment by design."""
    raise NotImplementedError(
        "media codecs are not installed; use the deterministic fake extractor"
    )


def _extract(payload: bytes) -> tuple[float, float, float, float]:
    """Deterministic fake feature extractor over raw bytes (byte-level
    stats); stands in for a decoded-media embedding."""
    if not payload:
        return 0.0, 0.0, 0.0, 0.0
    n = len(payload)
    head = payload[: min(16, n)]
    tail = payload[-min(16, n):]
    mean = sum(payload) / n
    return (
        round(mean, 6),
        float(sum(head) % 256),
        float(sum(tail) % 256),
        round(max(payload) - min(payload), 6),
    )


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        feats = pdf["payload"].map(_extract)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["n_bytes"],
                "payload_md5": pdf["payload_md5"],
                "f_mean": feats.map(lambda t: t[0]),
                "f_head": feats.map(lambda t: t[1]),
                "f_tail": feats.map(lambda t: t[2]),
                "f_spread": feats.map(lambda t: t[3]),
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata (the multimodal
    table shape). Here the payload is the utf-8 text; for real corpora
    it is the image/audio bytes, same schema."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("modality"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def mm_binary_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 — binary-column pipeline: metadata projection stays columnar;
    only (doc_id, payload, metadata) flows into the Arrow extractor."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    binary = with_binary_payload(docs)
    return binary.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


CHUNK = 100  # payload chunk size (bytes/chars) — the frame-sampling unit


def mm_chunk_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15 — chunking / frame-sampling plumbing: split each payload into
    fixed-size chunks, one output row per chunk with its fingerprint —
    the layout step before per-frame decode (video frame sampling, audio
    windowing). Pure posexplode over a generated index — columnar
    end-to-end, no UDF; chunk count scales with payload size, rows stay
    bounded per task."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_chunks = F.ceil(F.length("text") / F.lit(CHUNK)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunk_of = lambda i: F.col("text").substr(  # noqa: E731
        i * CHUNK + 1, F.lit(CHUNK)
    )
    return docs.select(
        "doc_id", "text", F.posexplode(idx).alias("chunk_idx", "i")
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5(chunk_of(F.col("i"))).alias("chunk_md5"),
        F.length(chunk_of(F.col("i"))).alias("chunk_len"),
    )


QUERIES = {
    "mm_binary_pipeline": mm_binary_pipeline,
    "mm_chunk_fingerprints": mm_chunk_fingerprints,
}

# mm_binary_pipeline is rows-only: the extractor is engine-side by
# definition (that's the point of the stub). Chunking is deterministic →
# oracle-checked.
ORACLES: dict[str, str] = {
    "mm_chunk_fingerprints": f"""
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               md5(substr(text, 1 + {CHUNK} * i, {CHUNK})) AS chunk_md5,
               CAST(length(substr(text, 1 + {CHUNK} * i, {CHUNK})) AS INT)
                   AS chunk_len
        FROM (
            SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(length(text) / {CHUNK}.0) AS BIGINT)))
                       AS i
            FROM documents
        )
    """,
}
