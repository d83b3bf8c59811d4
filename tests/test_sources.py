"""Source/sink tests (SURVEY.md §2.D2-D3): partitioned parquet layout with
partition pruning, csv/json round-trips with explicit schemas."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.catalog import load_events
from euclid_spark.sources.readers import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_partitioned_by_day,
)
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load_events(spark, SF_SMOKE)
    write_partitioned_by_day(ev, "ts", out)

    pruned = spark.read.parquet(out).filter(F.col("day") == "2024-01-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() > 0
    # partition filter must reach the scan (directory pruning, not a row filter)
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:200]


def test_csv_roundtrip(spark, tmp_path):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    path = str(tmp_path / "cust_csv")
    write_csv(cust, path)
    back = read_csv(spark, path, cust.schema)
    assert back.count() == cust.count()
    assert {f.name for f in back.schema.fields} == {f.name for f in cust.schema.fields}


def test_json_roundtrip(spark, tmp_path):
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    path = str(tmp_path / "nation_json")
    write_json(nat, path)
    back = read_json(spark, path, nat.schema)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nat.collect()
    )


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """D23: ORC round-trip preserves rows AND pushes predicates to the
    scan like parquet (the reference's columnar-ingest contract is
    format-agnostic)."""
    from euclid_spark.sources.readers import read_orc, write_orc

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    path = str(tmp_path / "cust_orc")
    write_orc(cust, path)
    back = read_orc(spark, path)
    assert back.count() == cust.count()
    filtered = back.filter(F.col("c_custkey") < 100)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "c_custkey" in plan
    assert filtered.count() == cust.filter(F.col("c_custkey") < 100).count()


def test_text_lines_roundtrip(spark, tmp_path):
    """D23: one-doc-per-line text ingest (crawl-dump shape) survives a
    write/read cycle with content intact."""
    from euclid_spark.sources.readers import read_text_lines, write_text_lines

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    path = str(tmp_path / "docs_txt")
    write_text_lines(docs, "text", path)
    back = read_text_lines(spark, path)
    assert back.count() == docs.count()
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["text"] for r in docs.collect()
    )


def test_schema_evolution_merge_read(spark, tmp_path):
    """D29: SCHEMA EVOLUTION across parquet batches — a later ingest
    adds a column; mergeSchema reads the union schema with nulls for
    the old files, column pruning still prunes, and a query filtering
    on the NEW column sees only the new rows. The append-only lake
    contract: old data never rewritten when the schema grows."""
    from pyspark.sql import functions as F

    v1 = spark.range(0, 100).select(
        F.col("id").alias("event_id"), (F.col("id") * 2).alias("value")
    )
    v1.write.parquet(f"{tmp_path}/evt/batch=1")
    v2 = spark.range(100, 150).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 2).alias("value"),
        F.lit("eu-west").alias("region"),  # the new column
    )
    v2.write.parquet(f"{tmp_path}/evt/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{tmp_path}/evt"
    )
    assert set(merged.columns) == {"event_id", "value", "region", "batch"}
    assert merged.count() == 150
    # old files surface NULL for the evolved column
    nulls = merged.filter(F.col("region").isNull())
    assert nulls.count() == 100
    assert nulls.agg(F.max("event_id")).collect()[0][0] == 99
    # filtering on the new column touches only new rows
    assert merged.filter(F.col("region") == "eu-west").count() == 50
    # pruned projection on the evolved read still works
    assert merged.select("event_id").distinct().count() == 150
