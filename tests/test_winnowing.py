"""C41 winnowing: the LOCAL SAMPLING GUARANTEE (Schleimer et al. 2003
theorem) — any two documents sharing a token run of length >= w+k-1
share at least one selected fingerprint; plus density sanity."""

from __future__ import annotations

import random

from euclid_spark.operators.textops import (
    WINNOW_K,
    WINNOW_W,
    text_winnowing,
)
from tests.conftest import SF_SMOKE


def _fingerprints(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    import euclid_spark.operators.textops as t

    orig = t._docs
    t._docs = lambda s, d: df
    try:
        # _winnow_build directly: the artifact wrapper fingerprints the
        # real corpus files, which this synthetic frame bypasses
        rows = t._winnow_build(spark, "unused").collect()
    finally:
        t._docs = orig
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_shared_run_guarantees_shared_fingerprint(spark):
    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    shared = " ".join(rnd.choice(vocab) for _ in range(WINNOW_W + WINNOW_K - 1))
    docs = []
    for doc_id in range(10):
        pre = " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(20, 40)))
        post = " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(20, 40)))
        docs.append((doc_id, f"{pre} {shared} {post}"))
    fps = _fingerprints(spark, docs)
    common = set.intersection(*fps.values())
    assert common, "docs sharing a w+k-1 token run must share a fingerprint"


def test_density_is_sampled_not_full(spark):
    got = text_winnowing(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_fp = got.count()
    # full k-gram stream would be ~sum(len(ws)); winnowing keeps ~2/(w+1)
    import pyspark.sql.functions as F
    from euclid_spark.functions.text import words

    n_tokens = (
        docs.select(F.size(words("text")).alias("n")).agg(F.sum("n")).collect()[0][0]
    )
    assert n_fp < 0.5 * n_tokens
