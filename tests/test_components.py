"""Connected components: fixed-point correctness vs a Python union-find
on the same edge set, plus a chain graph needing label propagation over
multiple rounds."""

from __future__ import annotations

from euclid_spark.operators.components import connected_components, dedup_components
from tests.conftest import SF_SMOKE


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_edge_source_evaluated_once(spark):
    """The r1 scale bug: each fixed-point round re-ran the whole upstream
    candidate-pair pipeline. Tap the edge source with an accumulator and
    prove it is evaluated exactly twice (once per union branch of the
    symmetrization) regardless of how many rounds the loop runs."""
    n_edges = 30
    acc = spark.sparkContext.accumulator(0)
    base = spark.createDataFrame(
        [(i, i + 1) for i in range(n_edges)], "doc_a long, doc_b long"
    )

    def tap(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    edges = base.mapInPandas(tap, "doc_a long, doc_b long")
    labels = connected_components(edges)
    got = {r["doc_id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n_edges + 1)}
    assert acc.value == 2 * n_edges, (
        f"edge source evaluated {acc.value / n_edges:.0f}×, expected 2× "
        "(persisted symmetrized edge set must feed every round)"
    )


def test_unconverged_loop_warns(spark):
    import pytest as _pytest

    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with _pytest.warns(RuntimeWarning, match="no fixed point"):
        connected_components(df, max_rounds=1)


def test_chain_graph_converges_to_min_label(spark):
    # 0-1-2-3-4-5 chain plus separate pair (10, 11)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 10: 10, 11: 10}


def test_components_match_union_find_on_real_pairs(spark):
    from euclid_spark.operators.dedup import dedup_ngram_jaccard

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    ]
    nodes = sorted({x for p in pairs for x in p})
    expected = _union_find(pairs, nodes)
    got = {
        r["doc_id"]: r["component"]
        for r in dedup_components(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_triangle_count_on_planted_clique(spark, tmp_path, monkeypatch):
    """C47: four identical documents form a K4 in the LSH candidate
    graph — every member has degree 3, sits in C(3,2)=3 triangles, and
    has clustering coefficient 1.0; a brute-force triple check over the
    actual pair set confirms the degree-ordered orientation counts each
    triangle exactly once."""
    from itertools import combinations

    from euclid_spark.operators.components import graph_triangle_count
    from euclid_spark.operators.dedup import dedup_minhash_lsh

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(4)] + [
        (10, "completely unrelated prose about register allocation"),
        (11, "another disjoint text on queueing theory and littles law"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")

    got = {
        r["doc_id"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in graph_triangle_count(spark, str(tmp_path)).collect()
    }
    for i in range(4):
        assert got[i] == (3, 3, 1.0), got
    assert all(k < 4 for k in got), "singletons must not appear"

    # brute-force audit over the real pair set (any corpus shape)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, str(tmp_path)).collect()
    }
    nodes = sorted({x for p in pairs for x in p})
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    brute = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                brute[x] += 1
    assert {k: v[1] for k, v in got.items()} == brute
