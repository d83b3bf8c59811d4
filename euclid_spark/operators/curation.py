"""End-to-end training-data curation pipeline (SURVEY.md §2.C25).

The production deliverable of the LLM-data surface: one query that
composes the individual curation operators into the final kept
training set —

  1. near-duplicate DEDUP keep-list (C16: MinHash/Jaccard candidate
     pairs → connected components → canonical member per cluster),
  2. within-document REPETITION rules (C21, Gopher/MassiveText),
  3. benchmark CONTAMINATION screen (C23, GPT-3 app. C n-gram
     overlap) — contaminated docs AND the benchmark sources
     themselves are excluded,
  4. deterministic STRATIFIED SAMPLING to the target language mix
     (C22, md5-bucket thresholds — no random()).

Plan shape: the sample predicate is row-local (applied on the scan);
the three survivorship checks are semi/anti joins on doc_id — same
shuffle key throughout, so AQE plans one exchange per branch and the
expensive branch (the dedup pipeline) is computed once. Every stage is
individually oracle-checked by its own registry entry; the composition
is oracle-checked here by embedding those same SQL bodies as
subqueries (DuckDB evaluates the identical semantics end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from euclid_spark.operators import components, textops
from euclid_spark.operators.textops import BENCH_SOURCES


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25 — the final kept set: (doc_id, lang, source, bucket_hex) of
    every document that survives dedup, repetition, and contamination
    screening and is selected by the stratified sample."""
    sample = textops.text_stratified_sample(spark, sf_dir).filter(
        ~F.col("source").isin(*BENCH_SOURCES)
    )
    kept = components.dedup_keep_list(spark, sf_dir).select("doc_id")
    rep_ok = (
        textops.text_repetition_filter(spark, sf_dir)
        .filter("keep")
        .select("doc_id")
    )
    contaminated = (
        textops.text_benchmark_overlap(spark, sf_dir)
        .filter("contaminated")
        .select("doc_id")
    )
    return (
        sample.join(kept, "doc_id", "left_semi")
        .join(rep_ok, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
    )


def _oracle() -> str:
    samp = textops.ORACLES["text_stratified_sample"]
    rep = textops.ORACLES["text_repetition_filter"]
    contam = textops.ORACLES["text_benchmark_overlap"]
    keep = components.ORACLES["dedup_keep_list"]
    bench = ", ".join(f"'{s}'" for s in BENCH_SOURCES)
    return f"""
        SELECT s.doc_id, s.lang, s.source, s.bucket_hex
        FROM ({samp}) s
        JOIN ({keep}) k ON s.doc_id = k.doc_id
        JOIN (SELECT doc_id FROM ({rep}) WHERE keep) r ON s.doc_id = r.doc_id
        LEFT JOIN (SELECT doc_id FROM ({contam}) WHERE contaminated) c
               ON s.doc_id = c.doc_id
        WHERE c.doc_id IS NULL AND s.source NOT IN ({bench})
    """


QUERIES = {
    "curation_pipeline": curation_pipeline,
}

ORACLES = {
    "curation_pipeline": _oracle(),
}
