"""Runtime join-pruning filters (SURVEY.md §2.D16): Bloom pruning must
never drop a true match (no false negatives), must actually prune
(power), and must appear in the q18 plan it was built for."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

from euclid_spark.operators.relational import q18_large_volume
from euclid_spark.operators.runtime_filters import (
    bloom_build,
    bloom_prune,
    semi_prune,
)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))
    bf = bloom_build(keys, "k")
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    kept = {r["k"] for r in bloom_prune(probe, "k", bf).collect()}
    true = {r["k"] for r in keys.collect() if r["k"] < 20000}
    assert true <= kept, "bloom dropped a true member"


def test_bloom_prunes_most_non_members(spark):
    keys = spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))
    bf = bloom_build(keys, "k")
    probe = spark.range(0, 200_000).select(F.col("id").alias("k"))
    kept = bloom_prune(probe, "k", bf).count()
    # ~ true members (1000·something < 20000) + fpr·200k; at default
    # m=2^20, k=3, n=3000 bits set the FPR is ≪ 1%
    assert kept < 10_000, f"bloom barely pruned: kept {kept} of 200000"


def test_semi_prune_exact(spark):
    keys = spark.range(0, 100).select((F.col("id") * 3).alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("p"))
    kept = {r["p"] for r in semi_prune(probe, "p", keys, "k").collect()}
    assert kept == {i * 3 for i in range(100) if i * 3 < 1000}


def test_q18_plan_carries_the_semi_pushdown(spark):
    df = q18_large_volume(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, "q18 plan lost the runtime semi-join filter"


def test_bloom_query_plan_carries_the_filter(spark):
    from euclid_spark.operators.relational import bloom_join_prune

    df = bloom_join_prune(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bloom_bf" in plan, "plan lost the runtime bloom filter"
    assert "xxhash64" in plan
