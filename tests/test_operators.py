"""Operator-level tests (SURVEY.md §5 level 2): every registry query runs
at sf0.001 with a stable schema, and every oracle-declared query matches
DuckDB at sf0.01 — the same comparison the driver performs."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# queries whose correct result may legitimately be empty at tiny SF
MAY_BE_EMPTY = {
    "rel_semi_anti_join",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "tpch_q7_nation_volume",  # narrow nation pair: empty at sf0.001
    "dedup_components",  # clusters exist only where near-dup pairs do
}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "M":
            s = df[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
            df[c] = s.str.replace(" 00:00:00.000000", "", regex=False)
        elif k in "iub":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_at_smoke_sf(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name} unexpectedly empty at {SF_SMOKE}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _normalize(QUERIES[name](spark, SF_ORACLE).toPandas())
    ddf = _normalize(duck.execute(ORACLES[name]).fetchdf())
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False)


def test_every_query_key_is_in_survey_inventory():
    survey = open("SURVEY.md").read()
    missing = [k for k in QUERIES if f"`{k}`" not in survey]
    assert not missing, f"SURVEY.md §2 missing: {missing}"
