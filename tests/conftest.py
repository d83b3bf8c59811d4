from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from euclid_spark.session import get_session

    s = get_session("euclid_spark_tests")
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _release_caches():
    """Operators register persists via cache.persist_tracked; the test
    (as cache-lifecycle owner) releases them after its terminal action."""
    yield
    from euclid_spark.cache import release_all

    release_all()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    return con
