"""Bucketed layout must elide the join shuffle: same results as the
plain join, with zero Exchange operators in the physical plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from euclid_spark.sources.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in ./spark-warehouse (gitignored); warehouse.dir
    # is a static conf that can't be changed on a live session
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    write_bucketed(li, "li_b", "orderkey", 8)
    write_bucketed(orders, "orders_b", "orderkey", 8)
    yield "li_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join exercises the bucketed path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "orderkey")
    n_bucketed = joined.count()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n_plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n_bucketed == n_plain


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on the bucket key must not shuffle"
