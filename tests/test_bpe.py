"""Exact BPE (VERDICT r6 #6): the trainer against hand-derived merges
on the classic Sennrich fixture; encoding known-answers; the WHOLE
Spark pipeline (histogram → driver-side training → Arrow-batched
application) bit-exact against an independent pure-Python pass over
every smoke-corpus document; and the BPE-packed stream's gapless
invariant."""

from __future__ import annotations

import re

import pytest

from euclid_spark.functions.bpe import (
    count_tokens,
    encode_word,
    merge_ranks,
    train_bpe,
    word_symbols,
)
from tests.conftest import SF_SMOKE


def test_trainer_known_answer_sennrich_fixture():
    """The paper's own example histogram. Hand derivation of round 1:
    pair counts include (e,s)=9, (s,t)=9, (t,</w>)=9 — a three-way tie
    at the max, broken by the lexicographically smallest pair (e,s).
    After merging 'es': (es,t)=9 ties (t,</w>)=9 → (es,t) < (t,</w>)
    lexicographically → 'est'; then (est,</w>)=9 is the unique max."""
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(hist, 3)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>")]


def test_encode_known_answers():
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ranks = merge_ranks(train_bpe(hist, 10))
    # 'newest' and 'widest' end in the fully-merged 'est</w>' symbol
    assert encode_word("newest", ranks)[-1].endswith("est</w>")
    # an unseen word with no applicable merges stays fully split
    assert encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]
    assert encode_word("", ranks) == []
    # token counts are word-local sums
    n = count_tokens(["newest", "xyz", ""], ranks)
    assert n == len(encode_word("newest", ranks)) + 4


def test_training_is_deterministic_under_histogram_permutation():
    hist = {"alpha": 3, "beta": 3, "gamma": 2, "delta": 5}
    a = train_bpe(dict(sorted(hist.items())), 20)
    b = train_bpe(dict(sorted(hist.items(), reverse=True)), 20)
    assert a == b


def test_spark_pipeline_matches_pure_python_reference(spark, tmp_path, monkeypatch):
    """End-to-end bit-exactness: the Spark counts for EVERY smoke-corpus
    document equal an independent pure-Python pass (same normalization,
    same histogram truncation, same trainer)."""
    from euclid_spark.operators.textops import (
        BPE_N_MERGES,
        BPE_VOCAB_TOP,
        text_bpe_token_count,
    )

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in text_bpe_token_count(spark, SF_SMOKE).collect()
    }

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    norm = lambda t: re.sub(r"\s+", " ", (t or "").lower()).strip().split(" ")  # noqa: E731
    hist: dict[str, int] = {}
    for r in docs:
        for w in norm(r["text"]):
            if w:
                hist[w] = hist.get(w, 0) + 1
    top = dict(
        sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_VOCAB_TOP]
    )
    ranks = merge_ranks(train_bpe(top, BPE_N_MERGES))
    cache: dict[str, int] = {}
    for r in docs:
        ws = [w for w in norm(r["text"]) if w]
        expect = (len(ws), count_tokens(ws, ranks, cache))
        assert got[r["doc_id"]] == expect, f"doc {r['doc_id']}: {got[r['doc_id']]} != {expect}"
    assert len(got) == len(docs)


def test_bpe_packed_stream_is_gapless(spark, tmp_path, monkeypatch):
    """C26x: consecutive docs in the BPE-packed stream tile the token
    axis exactly — start_tok is the running sum of prior counts."""
    from euclid_spark.operators.textops import text_pack_sequences_bpe

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    rows = sorted(
        text_pack_sequences_bpe(spark, SF_SMOKE).collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows
    run = 0
    for r in rows:
        assert r["start_tok"] == run, f"gap at doc {r['doc_id']}"
        assert r["n_tokens"] > 0
        assert r["bin_start"] == r["start_tok"] // 2048
        run += r["n_tokens"]
