"""Similarity search over the embeddings table (SURVEY.md §2.C5-C6).

- C5: brute-force cosine top-k — the exact baseline. The query set is a
  tiny filtered slice, so the plan is broadcast(query) × corpus scan: at
  100 TB the corpus is never shuffled, each partition scores its local
  rows and TakeOrderedAndProject keeps k per query (no global sort).
- C6: random-hyperplane LSH — the scale path. Each vector gets an 8-bit
  bucket (sign of 8 fixed hyperplane projections); probes only score
  same-bucket rows, cutting the scored fraction to ~2⁻⁸ per bucket while
  recalling close vectors (which share signs with high probability).

All vector math is `zip_with`/`aggregate` higher-order functions: JVM
codegen, double precision, no Python UDF, no Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from euclid_spark.functions.vectors import cosine, dot

N_QUERIES = 5  # query set = vec_id < 5
TOP_K = 3
N_PLANES = 8
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — exact top-k: rank on the *rounded* cosine with a neighbor-id
    tiebreak so ordering is reproducible bit-for-bit by the oracle."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def _planes() -> list[list[float]]:
    """Fixed ±1 hyperplanes, deterministically derived from a counter via
    a small LCG (no RNG state, reproducible everywhere)."""
    vals, x = [], 1234567891
    for _ in range(N_PLANES):
        row = []
        for _ in range(DIM):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(1.0 if (x >> 32) & 1 else -1.0)
        vals.append(row)
    return vals


def lsh_bucket(emb_col: F.Column) -> F.Column:
    """8-bit random-hyperplane bucket id for an embedding column."""
    bucket = F.lit(0)
    for j, plane in enumerate(_planes()):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(emb_col, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 — ANN via hyperplane LSH (rows-only: approximate by design).
    Probes join only their own bucket; the corpus side is bucketed once
    and reusable across query batches."""
    emb = _emb(spark, sf_dir).withColumn("bucket", lsh_bucket(F.col("embedding")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        "bucket",
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        "bucket",
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


N_CENTROIDS = 8
N_PROBE = 2


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6b — IVF-style ANN: corpus vectors are assigned to their nearest
    centroid (inverted lists); each query probes only its N_PROBE nearest
    lists. Centroids here are a deterministic sample (first K vectors) —
    swap in k-means output without changing the plan. At scale the
    assignment is computed once and persisted; probes touch
    N_PROBE/N_CENTROIDS of the corpus."""
    emb = _emb(spark, sf_dir)
    cent = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )

    def nearest(df: DataFrame, id_col: str, emb_col: str, keep: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent)).select(
            id_col,
            emb_col,
            "cid",
            F.round(cosine(F.col(emb_col), F.col("cemb")), 6).alias("csim"),
        )
        w = Window.partitionBy(id_col).orderBy(F.desc("csim"), "cid")
        return (
            scored.withColumn("crn", F.row_number().over(w))
            .filter(F.col("crn") <= keep)
            .drop("csim", "crn")
        )

    corpus = nearest(
        emb.filter(F.col("vec_id") >= N_QUERIES).select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
        ),
        "neighbor_id",
        "ce",
        keep=1,
    )
    probes = nearest(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        ),
        "query_id",
        "qe",
        keep=N_PROBE,
    )
    scored = corpus.join(F.broadcast(probes), "cid").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


QUERIES = {
    "sim_topk_cosine": sim_topk_cosine,
    "sim_ann_lsh": sim_ann_lsh,
    "sim_ivf_topk": sim_ivf_topk,
}

_DOT = (
    "list_sum(list_transform(range(1, len(qe) + 1),"
    " i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))"
)
_NQ = "sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_NC = "sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

ORACLES = {
    "sim_topk_cosine": f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, embedding AS ce
              FROM embeddings WHERE vec_id >= {N_QUERIES}),
        s AS (SELECT query_id, neighbor_id,
                     ROUND({_DOT} / ({_NQ} * {_NC}), 6) AS cosine
              FROM c CROSS JOIN q),
        r AS (SELECT query_id, neighbor_id, cosine,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
              FROM s)
        SELECT query_id, neighbor_id, cosine, rn FROM r WHERE rn <= {TOP_K}
    """,
    # sim_ann_lsh: rows-only (approximate; bucket constants are engine-side)
}
