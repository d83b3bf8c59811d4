"""Structural invariants of the mixing/packing operators (C26/C27) that
the row-hash oracle can't express: stream gaplessness, window bounds,
and the flattening direction of the temperature mix."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.operators.textops import (
    CTX_LEN,
    TEMP_K,
    text_pack_sequences,
    text_temperature_sample,
)
from tests.conftest import SF_ORACLE


def test_packed_stream_is_gapless_and_windows_bound(spark):
    rows = sorted(
        text_pack_sequences(spark, SF_ORACLE).collect(),
        key=lambda r: r["start_tok"],
    )
    assert rows[0]["start_tok"] == 0
    expect = 0
    for r in rows:
        assert r["start_tok"] == expect, "gap or overlap in the packed stream"
        assert r["n_tokens"] > 0
        assert 0 <= r["bin_offset"] < CTX_LEN
        assert r["bin_start"] == r["start_tok"] // CTX_LEN
        assert r["bin_end"] == (r["start_tok"] + r["n_tokens"] - 1) // CTX_LEN
        expect = r["start_tok"] + r["n_tokens"]


def test_temperature_sample_flattens_sources(spark):
    """Keep rates are valid probabilities; bigger sources keep a SMALLER
    fraction (the α<1 flattening direction); small sources (n ≤ K) are
    kept whole."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    n_by_src = {r["source"]: r["n"] for r in
                docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    out = text_temperature_sample(spark, SF_ORACLE)
    rates = {
        r["source"]: r["p_keep"]
        for r in out.select("source", "p_keep").distinct().collect()
    }
    for src, p in rates.items():
        assert 0 < p <= 1
        if n_by_src[src] <= TEMP_K:
            assert p == 1.0
    ordered = sorted(rates, key=lambda s: n_by_src[s])
    ps = [rates[s] for s in ordered]
    assert ps == sorted(ps, reverse=True), "keep rate must fall as n grows"


def test_temperature_sample_deterministic(spark):
    a = {r["doc_id"] for r in text_temperature_sample(spark, SF_ORACLE).collect()}
    b = {r["doc_id"] for r in text_temperature_sample(spark, SF_ORACLE).collect()}
    assert a == b


from hypothesis import given, settings, strategies as st  # noqa: E402

from euclid_spark.operators.textops import PACK_BUCKET_BITS  # noqa: E402


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            # sparse ids crossing the 2^PACK_BUCKET_BITS bucket boundary
            st.integers(0, 5 * (1 << PACK_BUCKET_BITS)),
            st.integers(0, 50),  # token count (0 ⇒ excluded from stream)
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_pack_sequences_matches_python_reference(spark, docs_spec):
    """The two-level prefix sum must equal a sequential cumsum over
    doc_id order for ANY id distribution — including empty corpora,
    all-empty docs, and ids straddling prefix-sum buckets."""
    from euclid_spark.operators.textops import text_pack_sequences

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs_spec],
            # "a " * n → n TOKEN_RE tokens exactly
            "text": ["a " * n for _, n in docs_spec],
            "lang": "en",
            "source": "src5",
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(f"{d}/documents.parquet", index=False)
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_tok"])
            for r in text_pack_sequences(spark, d).collect()
        }
    expect, cum = {}, 0
    for did, n in sorted(docs_spec):
        if n > 0:
            expect[did] = (n, cum)
            cum += n
    assert got == expect
