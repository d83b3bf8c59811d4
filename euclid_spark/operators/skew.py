"""Skew-mitigation utilities (SURVEY.md §6).

At 100 TB a handful of hot keys (one whale account, one viral token)
dominate a shuffle partition and stall the stage. Two standard remedies,
expressed as reusable plan rewrites:

- `salted_agg`: two-phase aggregation — partial-aggregate on
  (keys + salt) so a hot key's rows spread over N reducers, then
  final-aggregate on the keys. Works for any algebraic aggregate
  (sum/count/min/max — supply both phases).
- `salted_join`: big side gets a random-ish salt from a stable hash of
  non-key columns; the small side is exploded N× (one row per salt) so
  every (key, salt) pair still matches. Hot-key rows now land on N
  partitions instead of one.

AQE's skew-join splitting handles many cases automatically
(spark.sql.adaptive.skewJoin.enabled is on in session.py); these are for
aggregations (which AQE does not salt) and for deterministic plan shapes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from euclid_spark.catalog import cached_parquet

DEFAULT_SALTS = 16


def with_salt(
    df: DataFrame,
    n_salts: int = DEFAULT_SALTS,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Deterministic row salt in [0, n_salts): stable hash of the NON-key
    columns mixed with a per-row monotonic id.

    Hashing the key columns is pointless (every row of a hot key shares
    them → one salt → no spread), and even non-key columns can be
    low-entropy (byte-identical rows); the monotonic id term guarantees
    spread regardless. `monotonically_increasing_id` is a function of
    (partition id, row position) — deterministic under task retry for
    deterministic inputs, unlike `rand()`."""
    exclude = set(key_cols)
    non_key = [c for c in df.columns if c not in exclude]
    return df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*non_key, F.monotonically_increasing_id()), F.lit(n_salts)
        ).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `partial_aggs` aggregate raw rows per (keys, salt); `final_aggs`
    re-aggregate the partials per keys (referencing the partials'
    aliases). Example: partial sum(x) AS s → final sum(s) AS total.
    """
    salted = with_salt(df, n_salts, key_cols=keys)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    n_salts×, join on (key, salt). Output columns = big ∪ small (minus
    the helper columns)."""
    big_s = with_salt(big, n_salts, key_cols=[key])
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    joined = big_s.join(small_r, on=[key, "_salt"], how="inner")
    return joined.drop("_salt")


def skew_salted_user_agg(spark, sf_dir: str) -> DataFrame:
    """B42 / D8's query face (the rel_bloom_join_prune precedent): the
    per-user event rollup through the TWO-PHASE salted aggregation.
    Salting is result-invariant — partials per (user, salt) re-fold to
    exactly the plain GROUP BY — so the oracle is the plain rollup,
    while the PLAN spreads any whale user's rows over DEFAULT_SALTS
    reducers (the aggregation-skew remedy AQE does not provide).

    Partials accumulate in DECIMAL (r7, mirroring the join face below):
    salting makes the merge order structurally different from the plain
    GROUP BY, so a double sum could land on the other side of a cent
    boundary after ROUND(·, 2). Decimal addition is exact, hence
    order-independent — the oracle uses the same decimal accumulation."""
    from euclid_spark.catalog import load_events

    ev = load_events(spark, sf_dir).select("user_id", "value")
    return salted_agg(
        ev,
        keys=["user_id"],
        partial_aggs=[
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        ],
        final_aggs=[
            F.sum("c").alias("n_events"),
            F.round(F.sum("s"), 2).cast("double").alias("total_value"),
        ],
    )


def skew_salted_enrich_join(spark, sf_dir: str) -> DataFrame:
    """D8's JOIN face: the fact-side enrichment join through the
    SALTED-JOIN rewrite — big side salted, small side replicated
    n_salts×, join on (key, salt) — so a whale key's rows land on
    DEFAULT_SALTS reducers instead of one (the join-skew remedy for
    when AQE's skew split cannot apply, e.g. pre-AQE stages or
    bucketed layouts). Salting is result-invariant, so the oracle is
    the plain join + rollup; DECIMAL sums keep the per-segment totals
    independent of the salt-induced addition order."""
    from euclid_spark.catalog import load_events

    ev = load_events(spark, sf_dir).select("user_id", "value")
    cust = (
        cached_parquet(spark, f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    joined = salted_join(ev, cust, "user_id")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_value"),
    )


QUERIES = {
    "rel_skew_salted_agg": skew_salted_user_agg,
    "rel_skew_salted_join": skew_salted_enrich_join,
}

ORACLES = {
    "rel_skew_salted_agg": """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_value
        FROM events GROUP BY user_id
    """,
    "rel_skew_salted_join": """
        SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_value
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY c.c_mktsegment
    """,
}
