"""C28 dedup_substring_spans + C29 text_importance_resample unit tests
(the cross-engine hash parity is covered by tools/crosscheck.py; these
pin the *semantics* on hand-built corpora)."""

from __future__ import annotations

from euclid_spark.operators.dedup import (
    SPAN_W,
    dedup_substring_spans,
)
from euclid_spark.operators.textops import text_importance_resample


import pytest


@pytest.fixture(autouse=True)
def _isolated_artifacts(tmp_path, monkeypatch):
    """These tests write tiny throwaway corpora; their quality-signal
    artifacts must not accumulate in the repo store."""
    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))


def _write_docs(spark, path, rows, schema="doc_id long, text string"):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )


def test_shared_span_coverage_is_union_not_sum(spark, tmp_path):
    """Docs A and B share their first 10 tokens; the three overlapping
    duplicated windows (p=0,1,2) must union to EXACTLY 10 covered
    tokens, not 3×SPAN_W."""
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(10))),
        (2, shared + " " + " ".join(f"b{i}" for i in range(10))),
        (3, " ".join(f"c{i}" for i in range(20))),
    ]
    _write_docs(spark, str(tmp_path), rows)
    got = {r["doc_id"]: r for r in dedup_substring_spans(spark, str(tmp_path)).collect()}
    for d in (1, 2):
        assert got[d]["n_tokens"] == 20
        assert got[d]["n_windows"] == 20 - SPAN_W + 1
        assert got[d]["n_dup_windows"] == 10 - SPAN_W + 1  # p = 0,1,2
        assert got[d]["dup_tokens"] == 10  # union of [0,7],[1,8],[2,9]
        assert got[d]["dup_frac"] == 0.5
        assert got[d]["flagged"]
    assert got[3]["n_dup_windows"] == 0
    assert got[3]["dup_tokens"] == 0
    assert not got[3]["flagged"]


def test_identical_docs_fully_covered(spark, tmp_path):
    """Verbatim duplicates are 100% duplicated material."""
    text = " ".join(f"w{i}" for i in range(20))
    _write_docs(spark, str(tmp_path), [(1, text), (2, text)])
    got = {r["doc_id"]: r for r in dedup_substring_spans(spark, str(tmp_path)).collect()}
    for d in (1, 2):
        assert got[d]["dup_tokens"] == 20
        assert got[d]["dup_frac"] == 1.0
        assert got[d]["flagged"]


def test_within_doc_repetition_is_not_cross_doc_dup(spark, tmp_path):
    """A window repeated only WITHIN one doc doesn't mark it (cross-doc
    dedup; within-doc repetition is text_repetition_filter's job)."""
    run = " ".join(f"r{i}" for i in range(SPAN_W))
    rows = [
        (1, run + " " + run),  # self-repeats, no partner doc
        (2, " ".join(f"z{i}" for i in range(16))),
    ]
    _write_docs(spark, str(tmp_path), rows)
    got = {r["doc_id"]: r for r in dedup_substring_spans(spark, str(tmp_path)).collect()}
    assert got[1]["n_dup_windows"] == 0
    assert got[1]["dup_tokens"] == 0


def test_short_docs_emit_zero_windows(spark, tmp_path):
    """Docs under SPAN_W tokens still appear in the output, all-zero."""
    _write_docs(spark, str(tmp_path), [(1, "a b c"), (2, "a b c")])
    got = {r["doc_id"]: r for r in dedup_substring_spans(spark, str(tmp_path)).collect()}
    for d in (1, 2):
        assert got[d]["n_windows"] == 0
        assert got[d]["dup_tokens"] == 0
        assert not got[d]["flagged"]


_LANG_SCHEMA = "doc_id long, text string, lang string"


def test_dsir_selects_by_content_not_label(spark, tmp_path):
    """Target-vocabulary docs score λ > 0 regardless of their own lang
    label (DSIR scores CONTENT under the target LM; the label only
    defines which docs estimate that LM)."""
    en = "alpha beta gamma delta epsilon"
    de = "uno dos tres cuatro cinco"
    rows = [(i, en, "en") for i in range(10)]
    rows += [(100 + i, de, "de") for i in range(10)]
    rows += [(500, en, "de")]  # en-vocab content mislabeled de
    _write_docs(spark, str(tmp_path), rows, _LANG_SCHEMA)
    got = {
        r["doc_id"]: r
        for r in text_importance_resample(spark, str(tmp_path)).collect()
    }
    assert all(got[i]["selected"] for i in range(10))
    assert not any(got[100 + i]["selected"] for i in range(10))
    assert got[500]["selected"]  # content wins over label
    assert got[500]["dsir_weight"] == got[0]["dsir_weight"]


def test_dsir_weight_scales_with_length(spark, tmp_path):
    """λ is a sum over token features: a doc repeating the target
    vocabulary twice scores about twice the single copy (same bucket
    log-ratios, double the counts — bigram across the seam adds one
    extra feature, so compare with tolerance)."""
    en = "alpha beta gamma delta epsilon"
    rows = [(i, en, "en") for i in range(10)]
    rows += [(100 + i, "uno dos tres cuatro cinco", "de") for i in range(10)]
    rows += [(500, en + " " + en, "en")]
    _write_docs(spark, str(tmp_path), rows, _LANG_SCHEMA)
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in text_importance_resample(spark, str(tmp_path)).collect()
    }
    assert got[500] > 1.5 * got[0] > 0


def test_perplexity_buckets_order_and_balance(spark, tmp_path):
    """Within a language: every head doc scores >= every middle doc >=
    every tail doc, and tercile sizes are n/3 up to tie mass."""
    from euclid_spark.operators.textops import text_perplexity_buckets

    common = "the fast key " * 3          # high-probability words
    rows = []
    for i in range(30):
        # vary rarity: doc i carries i distinct rare tokens
        rare = " ".join(f"rare{i}x{j}" for j in range(i % 10))
        rows.append((i, f"{common} {rare}".strip(), "en"))
    _write_docs(spark, str(tmp_path), rows, _LANG_SCHEMA)
    got = text_perplexity_buckets(spark, str(tmp_path)).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_logprob"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    # sizes: 30 docs but scores tie in groups; each tercile ±tie mass
    assert sum(len(v) for v in by_bucket.values()) == 30


def test_semdedup_planted_duplicates(spark, tmp_path, monkeypatch):
    """Planted near-identical embedding pairs are flagged within their
    cluster; the lowest id of each pair survives; unrelated random
    vectors all keep."""
    import numpy as np

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "arts"))
    from euclid_spark.operators.dedup import SEMDEDUP_TAU, dedup_semantic

    rng = np.random.default_rng(7)
    rows = []
    # two dup groups: base vector + tiny-perturbation copy (cos ≈ 1)
    for gid, base_id in ((0, 10), (1, 20)):
        base = rng.normal(size=16)
        for j, eps in ((0, 0.0), (1, 1e-3)):
            v = base + eps * rng.normal(size=16)
            rows.append((base_id + j, [float(x) for x in v], gid))
    # 40 unrelated random vectors (near-orthogonal in 16-d w.h.p.)
    for i in range(100, 140):
        rows.append((i, [float(x) for x in rng.normal(size=16)], 9))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    got = {r["vec_id"]: r for r in dedup_semantic(spark, str(tmp_path)).collect()}
    assert len(got) == 44
    for base_id in (10, 20):
        assert got[base_id]["is_dup"] and got[base_id]["keep"]  # survivor
        assert got[base_id + 1]["is_dup"] and not got[base_id + 1]["keep"]
        assert got[base_id]["max_cos"] >= SEMDEDUP_TAU
        assert got[base_id]["cid"] == got[base_id + 1]["cid"]
    assert all(got[i]["keep"] and not got[i]["is_dup"] for i in range(100, 140))


def test_training_mix_packed_stream_is_gapless(spark):
    """C32: survivors' packed offsets form one contiguous token stream
    in doc_id order — no gaps, no overlaps, bins consistent."""
    from euclid_spark.operators.curation import curation_training_mix
    from euclid_spark.operators.textops import CTX_LEN

    rows = sorted(
        curation_training_mix(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows, "smoke corpus must have survivors"
    pos = 0
    for r in rows:
        assert r["start_tok"] == pos
        assert r["bin_start"] == pos // CTX_LEN
        assert r["bin_end"] == (pos + r["n_tokens"] - 1) // CTX_LEN
        assert r["bin_offset"] == pos % CTX_LEN
        pos += r["n_tokens"]


def test_ngram_counts_occurrences_vs_docs(spark, tmp_path, monkeypatch):
    """C33: within-doc repetition raises n_occurrences but not n_docs;
    singletons are pruned."""
    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "arts"))
    from euclid_spark.operators.textops import text_ngram_counts

    run = "a b c d e"
    rows = [
        (1, f"{run} {run}"),     # the 5-gram "a b c d e" twice in doc 1
        (2, run),                # once in doc 2
        (3, "v w x y z"),        # singleton 5-gram → pruned
    ]
    _write_docs(spark, str(tmp_path), rows)
    got = {r["ngram"]: r for r in text_ngram_counts(spark, str(tmp_path)).collect()}
    assert got["a b c d e"]["n_occurrences"] == 3
    assert got["a b c d e"]["n_docs"] == 2
    assert "v w x y z" not in got




@pytest.mark.parametrize("seed", [0, 1, 2])
def test_substring_spans_match_python_reference(spark, tmp_path, monkeypatch, seed):
    """C28 vs a brute-force Python reference on random corpora with
    planted shared runs: window hashing, cross-doc dup detection, and
    interval-union coverage all agree exactly."""
    import random

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "arts"))
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → natural collisions
    shared = [f"s{seed}{j}" for j in range(rng.randint(8, 14))]
    docs = {}
    for d in range(12):
        toks = [rng.choice(vocab) for _ in range(rng.randint(5, 30))]
        if rng.random() < 0.5:  # plant the shared run at a random offset
            at = rng.randint(0, len(toks))
            toks = toks[:at] + shared + toks[at:]
        docs[d] = toks
    _write_docs(spark, str(tmp_path), [(d, " ".join(t)) for d, t in docs.items()])

    # brute-force reference
    W = SPAN_W
    owner = {}
    for d, toks in docs.items():
        for p in range(len(toks) - W + 1):
            owner.setdefault(tuple(toks[p : p + W]), set()).add(d)
    expect = {}
    for d, toks in docs.items():
        marked = [
            p for p in range(len(toks) - W + 1)
            if len(owner[tuple(toks[p : p + W])]) >= 2
        ]
        covered = set()
        for p in marked:
            covered.update(range(p, p + W))
        expect[d] = (len(toks), max(0, len(toks) - W + 1), len(marked), len(covered))

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_windows"], r["n_dup_windows"], r["dup_tokens"])
        for r in dedup_substring_spans(spark, str(tmp_path)).collect()
    }
    assert got == expect
