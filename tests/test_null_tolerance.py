"""NULL-tolerance net: production tables carry NULLs the synthetic
testdata never does (nullable ingest columns, failed upstream parses).
Representative operators must tolerate a corpus where 10 % of every
nullable attribute is NULL — no crashes, deterministic output across
two runs. (Result VALUES under nulls are operator-defined; this net
pins survival + determinism, the empty-corpus net's sibling.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from euclid_spark import registry
from euclid_spark.cache import release_all
from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# deterministic 10% null mask per (table, column)
NULLABLE = {
    "documents": ["text", "lang", "source"],
    "events": ["event_type", "value", "props"],
    "lineitem": ["l_returnflag", "l_discount"],
}

OPS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_token_count",
    "text_lang_id",
    "text_lang_confusion",
    "text_data_card",
    "text_quality_score",
    "rel_sessionize",
    "rel_event_dedup_window",
    "rel_ohlc_resample",
    "rel_value_outliers",
    "rel_seasonal_profile",
    "rel_table_profile",
    "tpch_q1_pricing_summary",
    "curation_leakage_safe_split",
]


@pytest.fixture(scope="module")
def nully_sf(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nully_sf"))
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        for c in NULLABLE.get(t, []):
            key = df.columns[0]
            mask = F.pmod(F.xxhash64(F.col(key), F.lit(c)), F.lit(10)) == 0
            df = df.withColumn(
                c, F.when(mask, F.lit(None)).otherwise(F.col(c))
            )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_operators_tolerate_nulls(spark, nully_sf, monkeypatch, tmp_path):
    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    qs = registry.queries()
    failures = []
    for name in OPS:
        try:
            first = _rows(qs[name](spark, nully_sf))
            again = _rows(qs[name](spark, nully_sf))
            if first != again:
                failures.append(f"{name}: nondeterministic under nulls")
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: raised {type(ex).__name__}: {ex}"[:200])
        finally:
            release_all()
    assert not failures, "\n".join(failures)
