"""Small-file compaction (SURVEY §2.D14): many-file directory → few
evenly-sized files, rows and content exactly preserved."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.sources.compaction import compact_parquet_dir, dir_parquet_stats


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    out = str(tmp_path / "frag")
    # simulate streaming ingest: 40 tiny files
    spark.range(20_000).withColumn("v", F.col("id") * 3).repartition(40).write.parquet(out)
    n0, _ = dir_parquet_stats(out)
    assert n0 >= 40

    before = spark.read.parquet(out)
    rows_before = before.count()
    digest_before = before.agg(F.sum(F.col("id") * 7 + F.col("v"))).collect()[0][0]

    n_b, n_a = compact_parquet_dir(spark, out, target_file_bytes=1 << 30)
    assert (n_b, n_a)[1] < 40 and n_a == 1  # tiny data → single target file

    after = spark.read.parquet(out)
    assert after.count() == rows_before
    assert after.agg(F.sum(F.col("id") * 7 + F.col("v"))).collect()[0][0] == digest_before


def test_compaction_noop_when_already_compact(spark, tmp_path):
    out = str(tmp_path / "ok")
    spark.range(1000).repartition(1).write.parquet(out)
    n_b, n_a = compact_parquet_dir(spark, out, target_file_bytes=1 << 30)
    assert n_b == n_a == 1
