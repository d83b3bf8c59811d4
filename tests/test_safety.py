"""C60 safety/blocklist screen: whole-word matching semantics, the
any-hit verdict, NULL tolerance, and the C25/C35 compositions — the
stand-in lexicons exercise the machinery a production badwords list
(C4, Raffel et al. 2020) inherits unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.operators.curation import curation_pipeline
from euclid_spark.operators.textops import (
    SAFETY_BLOCKLISTS,
    safety_counts,
    text_data_card,
    text_safety_screen,
)
from tests.conftest import SF_SMOKE


def test_whole_word_matching_not_substring(spark):
    """`\\b` boundaries: a blocklisted phrase inside a longer word does
    not match; repeated and case-varied occurrences count correctly;
    NULL text is never blocked."""
    docs = spark.createDataFrame(
        [
            (1, "slow slow query"),          # exact phrase → 1 hit
            (2, "slowslow slow slowly"),     # no word-boundary phrase
            (3, "SLOW SLOW and Dup Dup"),    # case-folded, 2 categories? no — both cat_a
            (4, None),                       # NULL text
            (5, "big big big"),              # overlapping: regex scans L→R → 1 hit
            (6, "hash dup big big"),         # two categories
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in safety_counts(docs).collect()}
    assert out[1]["n_cat_a"] == 1 and out[1]["blocked"]
    assert out[2]["n_hits"] == 0 and not out[2]["blocked"]
    assert out[3]["n_cat_a"] == 2 and out[3]["blocked"]
    assert out[4]["n_hits"] == 0 and not out[4]["blocked"]
    assert out[5]["n_cat_b"] == 1
    assert out[6]["n_cat_b"] == 1 and out[6]["n_cat_c"] == 1
    assert out[6]["n_hits"] == 2


def test_screen_rates_sane_at_smoke(spark):
    """The stand-in lexicon must be discriminative on this corpus:
    some docs blocked, most kept — a 0%- or 100%-blocked screen tests
    nothing."""
    out = text_safety_screen(spark, SF_SMOKE)
    n = out.count()
    blocked = out.filter("blocked").count()
    assert 0 < blocked < n // 2, (blocked, n)


def test_kept_set_excludes_blocked_docs(spark):
    """The C25 composition: no blocked doc survives to the kept
    training set, and the data card's per-stratum blocked counts sum
    to the corpus-wide blocked count."""
    blocked_ids = {
        r["doc_id"]
        for r in text_safety_screen(spark, SF_SMOKE)
        .filter("blocked")
        .select("doc_id")
        .collect()
    }
    assert blocked_ids  # the screen actually fires at this SF
    kept_ids = {
        r["doc_id"] for r in curation_pipeline(spark, SF_SMOKE).collect()
    }
    assert not (kept_ids & blocked_ids)
    card_total = (
        text_data_card(spark, SF_SMOKE)
        .agg(F.sum("n_blocked_docs").alias("s"))
        .collect()[0]["s"]
    )
    assert card_total == len(blocked_ids)


def test_blocklists_are_nonempty_and_lowercase():
    """The screen lowercases text before matching, so lexicon terms
    must be lowercase to ever match; empty categories are dead weight."""
    for cat, terms in SAFETY_BLOCKLISTS.items():
        assert terms, cat
        for t in terms:
            assert t == t.lower(), (cat, t)
