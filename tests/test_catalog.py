"""Catalog (SURVEY.md §2.D6): registered views drive the SQL API,
including the nanosecond-events conversion."""

from __future__ import annotations

from euclid_spark.catalog import TABLES, load_tables, register_views
from tests.conftest import SF_SMOKE


def test_load_tables_covers_all(spark):
    dfs = load_tables(spark, SF_SMOKE)
    assert set(dfs) == set(TABLES)
    assert dict(dfs["events"].dtypes)["ts"] == "timestamp"


def test_sql_over_registered_views(spark):
    register_views(spark, SF_SMOKE)
    row = spark.sql(
        """
        SELECT count(*) AS n_orders,
               count(DISTINCT c_custkey) AS n_customers
        FROM orders JOIN customer ON o_custkey = c_custkey
        """
    ).collect()[0]
    assert row["n_orders"] > 0 and row["n_customers"] > 0

    ev = spark.sql(
        "SELECT min(to_date(ts)) AS d0 FROM events"
    ).collect()[0]
    assert str(ev["d0"]) == "2024-01-01"
