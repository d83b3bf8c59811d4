"""Skew guards on the dedup pipeline (VERDICT r1 #3): a corpus-scale hot
shingle (a stopword trigram shared by every document) must NOT produce a
quadratic candidate blowup in the Jaccard inverted-index join."""

from __future__ import annotations

from euclid_spark.operators.dedup import (
    MAX_SHINGLE_DF,
    dedup_ngram_jaccard,
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")


def test_hot_shingle_capped(spark, tmp_path):
    """1000 docs share one trigram (df=1000 ≫ cap) but are otherwise
    unique → the hot shingle is dropped, zero pairs from it; a genuine
    near-dup pair (identical docs) still survives the cap."""
    n = 1000
    assert n > MAX_SHINGLE_DF
    rows = [
        (i, f"the quick fox u{i}a u{i}b u{i}c u{i}d") for i in range(n)
    ]
    rows += [
        (9001, "alpha beta gamma delta epsilon zeta"),
        (9002, "alpha beta gamma delta epsilon zeta"),
    ]
    _write_docs(spark, str(tmp_path), rows)

    got = dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert pairs == {(9001, 9002)}
    assert all(r["jaccard"] == 1.0 for r in got)


def test_cap_drops_from_numerator_and_denominator(spark, tmp_path):
    """Jaccard is computed over the capped shingle universe: two docs
    sharing only sub-cap shingles score on those alone."""
    # 60 filler docs make "x y z" exceed the cap; docs 1 and 2 share it
    # plus a rare tail — similarity must come from the tail only.
    rows = [(100 + i, f"x y z f{i}a f{i}b") for i in range(MAX_SHINGLE_DF + 10)]
    rows += [
        (1, "x y z rare tail one"),
        (2, "x y z rare tail two"),
    ]
    _write_docs(spark, str(tmp_path), rows)

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    }
    # capped universes: doc1 {"y z rare","z rare tail","rare tail one"},
    # doc2 {... "rare tail two"}; shared = 2 of 4 → jaccard 0.5
    assert got == {(1, 2): 0.5}
