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


QUERIES = {"dedup_components": dedup_components}
ORACLES: dict[str, str] = {}
