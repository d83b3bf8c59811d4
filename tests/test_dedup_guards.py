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


def test_simhash_degenerate_bucket_capped(spark, tmp_path):
    """VERDICT r4 #1: a degenerate simhash chunk bucket (many identical
    short docs collapsing to the same 16-bit chunks) must be dropped
    before the self-join — bounded pairs, not m². A genuine near-dup
    pair with distinctive text still survives."""
    from euclid_spark.operators.dedup import MAX_CHUNK_BUCKET, dedup_simhash

    m = MAX_CHUNK_BUCKET + 50  # one bucket of identical docs, over cap
    rows = [(i, "tiny doc") for i in range(m)]
    rows += [
        (9001, "a genuinely distinctive sentence about distributed tries"),
        (9002, "a genuinely distinctive sentence about distributed tries"),
    ]
    _write_docs(spark, str(tmp_path), rows)

    got = dedup_simhash(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    # without the cap this would be m*(m-1)/2 ≈ 11k pairs from the
    # degenerate bucket alone; with it, only the distinctive pair remains
    assert pairs == {(9001, 9002)}


def test_simhash_recall_unaffected_below_cap(spark, tmp_path):
    """The cap must not change results on a normal corpus: near-identical
    docs are still paired, unrelated docs are not."""
    from euclid_spark.operators.dedup import dedup_simhash

    base = " ".join(f"word{i}" for i in range(30))
    rows = [
        (1, base),
        (2, base),  # identical → hamming 0
        (3, base.replace("word29", "changed")),  # near-dup
        (4, "completely different text about oceanic navigation charts"),
        (5, "unrelated prose describing compiler construction techniques"),
    ]
    _write_docs(spark, str(tmp_path), rows)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in dedup_simhash(
        spark, str(tmp_path)
    ).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) in got
    assert all(4 not in p and 5 not in p for p in got)


def test_embedding_cosine_captures_known_near_dups(spark, tmp_path):
    """Signed feature hashing must score identical docs at 1.0 and keep
    unrelated docs out (the r2 regression: unsigned 16-dim counts scored
    EVERY long doc pair > 0.9)."""
    from euclid_spark.operators.dedup import dedup_embedding_cosine

    base = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, base),
        (2, base),  # identical → cosine exactly 1
        (3, base.replace("w19", "zzz")),  # 19/20 words shared → ≈ 0.95
        (4, "completely different words about sailing ships at sea today"),
        (5, "unrelated musings on compilers and garbage collection cycles"),
    ]
    _write_docs(spark, str(tmp_path), rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["cos_sim"]
        for r in dedup_embedding_cosine(spark, str(tmp_path)).collect()
    }
    assert got.get((1, 2)) == 1.0
    assert (1, 3) in got and got[(1, 3)] >= 0.7
    assert all(4 not in p and 5 not in p for p in got)


def test_minhash_estimate_pair_driven_and_complete(spark, tmp_path, monkeypatch):
    """C37's r7 scale-shape contract: the exact-Jaccard side is driven
    from the pair ledger (cost ∝ candidate pairs), not the co-shingle
    universe — on a corpus where EVERY doc shares a boilerplate trigram
    (the co-shingle blowup case) the calibration still reports only the
    genuine candidate pairs, with exact Jaccard over the FULL uncapped
    universe (boilerplate included). And NO candidate pair is dropped:
    one output row per ledger pair (zero-overlap candidates would
    surface as exact=0 — the maximal-error rows the audit exists for)."""
    from euclid_spark.operators.dedup import (
        dedup_minhash_estimate,
        dedup_minhash_lsh,
    )

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    # 40 identical-pair groups, every doc also carrying the same
    # boilerplate opener ("terms of service apply here") — the hot
    # co-shingle mass that made the old shape quadratic
    rows = []
    for g in range(40):
        body = f"terms of service apply here unique{g}a unique{g}b unique{g}c"
        rows.append((2 * g, body))
        rows.append((2 * g + 1, body))
    _write_docs(spark, str(tmp_path), rows)

    got = dedup_minhash_estimate(spark, str(tmp_path)).collect()
    ledger = dedup_minhash_lsh(spark, str(tmp_path)).collect()
    # completeness: exactly one calibration row per candidate pair
    assert len(got) == len(ledger) > 0
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in got}
    for g in range(40):
        pair = (2 * g, 2 * g + 1)
        assert pair in by_pair, f"identical pair {pair} missing"
        r = by_pair[pair]
        assert r["exact_jaccard"] == 1.0  # full uncapped universe
        assert r["est_jaccard"] == 1.0
        assert r["abs_err"] == 0.0
    # no cross-group pair can report exact > 0.5: groups share ONLY the
    # boilerplate prefix (3 of 9+ shingles)
    for (a, b), r in by_pair.items():
        if a // 2 != b // 2:
            assert r["exact_jaccard"] < 0.5


def test_containment_catches_nested_doc(spark, tmp_path, monkeypatch):
    """C45: a short doc pasted verbatim inside a much longer one must
    flag nested_doc (containment ≈ 1) even though symmetric Jaccard is
    diluted far below the near-dup threshold — the asymmetric case
    whole-doc dedup misses by design."""
    from euclid_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dedup_containment,
    )

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"filler{i}" for i in range(200))
    rows = [
        (1, short),
        (2, short + " " + filler),  # short nested inside long
        (3, "unrelated prose about compilers and garbage collection"),
    ]
    _write_docs(spark, str(tmp_path), rows)
    got = {
        (r["doc_a"], r["doc_b"]): r for r in dedup_containment(
            spark, str(tmp_path)
        ).collect()
    }
    assert (1, 2) in got, "nested pair not an LSH candidate"
    r = got[(1, 2)]
    assert r["contain_a_in_b"] >= 0.99
    assert r["jaccard"] < JACCARD_THRESHOLD  # symmetric measure diluted
    assert r["nested_doc"]
    assert all(3 not in p for p in got)


def test_leakage_safe_split_property(spark, tmp_path, monkeypatch):
    """C46: (a) every verified near-dup pair lands in ONE split — the
    leakage guarantee, including TRANSITIVE near-dups (a~b, b~c but a,c
    never paired directly must still share a split via the component);
    (b) every document gets exactly one assignment; (c) assignments are
    deterministic across invocations (md5 thresholds, no random())."""
    from euclid_spark.operators.curation import curation_leakage_safe_split
    from euclid_spark.operators.dedup import dedup_ngram_jaccard

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " lambda mu"),                 # a ~ b (high overlap)
        (2, base + " lambda nu"),                 # b ~ a and b ~ c
        (3, base + " xi nu"),                     # c ~ b (a,c weaker link)
        (4, "unrelated text about compilers and register allocation"),
        (5, "another singleton on queueing theory and little law"),
    ]
    _write_docs(spark, str(tmp_path), rows)
    split = {
        r["doc_id"]: (r["split"], r["component"])
        for r in curation_leakage_safe_split(spark, str(tmp_path)).collect()
    }
    assert sorted(split) == [1, 2, 3, 4, 5]  # exactly one row per doc
    for r in dedup_ngram_jaccard(spark, str(tmp_path)).collect():
        assert split[r["doc_a"]][0] == split[r["doc_b"]][0], (
            f"pair ({r['doc_a']},{r['doc_b']}) straddles splits"
        )
    # the planted chain is one component → one split for all three
    comps = {split[i][1] for i in (1, 2, 3)}
    if len(comps) == 1:  # chain connected (expected with these texts)
        assert len({split[i][0] for i in (1, 2, 3)}) == 1
    # determinism: a second invocation returns identical assignments
    again = {
        r["doc_id"]: (r["split"], r["component"])
        for r in curation_leakage_safe_split(spark, str(tmp_path)).collect()
    }
    assert again == split


def test_soft_dedup_weights_mass_property(spark, tmp_path, monkeypatch):
    """C54: (a) each near-dup cluster's weights sum to exactly one
    document's worth of sampling mass (within the 1e-9 rounding of the
    pinned weight column); (b) singletons weigh exactly 1.0; (c) every
    document appears exactly once; (d) weight · cluster_size
    reconstructs 1 — the invariant a training loader relies on."""
    from euclid_spark.operators.curation import curation_soft_dedup_weights

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " lambda mu"),
        (2, base + " lambda nu"),
        (3, base + " xi nu"),
        (4, "unrelated text about compilers and register allocation"),
        (5, "another singleton on queueing theory and little law"),
    ]
    _write_docs(spark, str(tmp_path), rows)
    got = curation_soft_dedup_weights(spark, str(tmp_path)).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2, 3, 4, 5]
    from collections import defaultdict

    mass = defaultdict(float)
    for r in got:
        mass[r["component"]] += r["weight"]
        assert abs(r["weight"] * r["cluster_size"] - 1.0) < 1e-8
        if r["cluster_size"] == 1:
            assert r["weight"] == 1.0
    for c, m in mass.items():
        assert abs(m - 1.0) < 1e-6, (c, m)
