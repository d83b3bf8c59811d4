"""Connected components over near-duplicate candidate pairs
(SURVEY.md §2.C14): clusters of mutually-similar documents, keeping the
lowest doc_id as the canonical representative — the final step of a
production dedup pipeline (pairs alone over-remove: A~B, B~C ⇒ one
cluster {A,B,C}, keep A).

Iterative label propagation (small-star style): every node repeatedly
adopts the minimum label in its neighborhood until a fixed point. Each
round is two hash joins + an aggregation — all shuffle-partitioned on the
node id; rounds ≈ O(log(diameter)). Results are persisted per round and
the loop stops on a converged count, so the plan lineage stays bounded
(the driver-side loop is orchestration only — per-round work is fully
distributed, no collect of edges)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_ROUNDS = 20


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """edges: (doc_a, doc_b) undirected. Returns (doc_id, component) with
    component = min doc_id reachable."""
    sym = edges.selectExpr("doc_a AS src", "doc_b AS dst").unionAll(
        edges.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    nodes = sym.select(F.col("src").alias("doc_id")).distinct()
    labels = nodes.withColumn("component", F.col("doc_id")).persist()

    for _ in range(max_rounds):
        neigh_min = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("neigh_component"))
        )
        new_labels = (
            labels.join(neigh_min, labels.doc_id == neigh_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neigh_component"), F.col("component")),
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 — cluster the verified near-dup pairs (trigram Jaccard ≥ 0.5)
    and emit (doc_id, component): docs absent from any pair are unique by
    definition and omitted. Iterative ⇒ rows-only for the oracle gate
    (per-round joins are SQL, the fixed-point loop is not)."""
    from euclid_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs).orderBy("doc_id")


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16 — the production deliverable of the dedup pipeline: the list of
    documents to KEEP — every doc that is not in a near-dup cluster, plus
    the canonical (minimum doc_id) member of each cluster. Anti-join of
    the corpus against non-canonical cluster members."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    comp = dedup_components(spark, sf_dir)
    drop = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(drop, "doc_id", "left_anti")


QUERIES = {
    "dedup_components": dedup_components,
    "dedup_keep_list": dedup_keep_list,
}

# The keep-list IS oracle-checkable even though components is iterative:
# DuckDB computes the same connected components as a recursive CTE
# (transitive closure over the verified near-dup pairs, then min label).
from euclid_spark.operators.dedup import (  # noqa: E402
    JACCARD_THRESHOLD as _JT,
    _SH,
)

ORACLES: dict[str, str] = {
    "dedup_keep_list": f"""
        WITH RECURSIVE
        {_SH},
        sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) * 1.0 /
                   ((SELECT n_sh FROM sz WHERE doc_id = a.doc_id)
                    + (SELECT n_sh FROM sz WHERE doc_id = b.doc_id)
                    - COUNT(*)) >= {_JT}
        ),
        sym AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM sym
            UNION
            SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        ),
        comp AS (
            SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
            FROM reach GROUP BY a
        )
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (
            SELECT doc_id FROM comp WHERE doc_id <> component
        )
    """,
}
