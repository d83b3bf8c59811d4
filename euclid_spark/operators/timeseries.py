"""Time-series operators over the irregular event stream (SURVEY.md
§2.B49-B50) — the hypertable-style surface (gap filling and
time-weighted aggregation are the two canonical continuous-time
operations; public shapes: TimescaleDB's time_bucket_gapfill/locf and
time_weight, kdb's fills).

Both are pure column-expression pipelines with deterministic
arithmetic (integer day steps; DECIMAL value·µs products), so both are
fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from euclid_spark.catalog import cached_parquet


def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49 — GAP FILLING with last-observation-carried-forward: the
    per-(user, day) state series (A7's rollup) has holes on days a
    user was silent; downstream joins and charts need a dense series.
    Per user, every calendar day in [their first day, their last day]
    is emitted; missing days carry the last observed value forward
    (is_observed marks the provenance — LOCF values are imputations,
    a data-card would count them).

    Scale shape: the day explode is bounded by span-days per user (a
    calendar, not the corpus); the carry-forward window is partitioned
    by user and ordered on the day key — no global sort, no
    SinglePartition. The last aggregation key (user, day) is the same
    key the explode produced, so the window rides the join's
    partitioning."""
    ev = cached_parquet(spark, f"{sf_dir}/events.parquet")
    # skip-NULL-writes rule (the A7 pin, caught by the null-injected
    # crosscheck): the day's observation is the latest NON-NULL value.
    # Spelled as max_by over a NULLed-out ordering (rows with a NULL
    # value contribute a NULL ordering, which max_by skips — matching
    # DuckDB's skip-NULLs max_by). r12: this replaces the equivalent
    # filtered-struct max because a STRUCT agg buffer is immutable and
    # forced the whole keyed aggregate into a sorting SortAggregate;
    # max_by's (double, long) buffer hash-aggregates under codegen.
    last_nn = F.max_by(
        "value", F.when(F.col("value").isNotNull(), F.col("event_id"))
    )
    obs = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(last_nn.alias("obs_value"))
    )
    span = obs.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        days.join(obs, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("obs_value", ignorenulls=True).over(w).alias("value"),
            F.col("obs_value").isNotNull().alias("is_observed"),
        )
    )


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B50 — TIME-WEIGHTED AVERAGE value per user: events sample an
    underlying state at irregular times, so the plain AVG over-weights
    chatty periods; the continuous-time mean weights each observation
    by how long it was current: TWA = Σ vᵢ·Δtᵢ / Σ Δtᵢ with
    Δtᵢ = tᵢ₊₁ − tᵢ (the final observation has no successor and drops
    out — the standard left-closed convention).

    Determinism: Δt in exact integer MICROSECONDS (the µs NTZ column),
    v·Δt accumulated in DECIMAL(38,6) — addition-order independent, so
    the hash matches the oracle under any merge order (the q15 rule).
    One lead() window per user + one aggregation on the same key."""
    ev = cached_parquet(spark, f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("t"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    us = (F.unix_micros(F.lead("t").over(w)) - F.unix_micros(F.col("t")))
    staged = ev.select(
        "user_id",
        "value",
        us.alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    vdt = (
        F.col("value").cast("decimal(18,6)") * F.col("dt_us")
    ).cast("decimal(38,6)")
    return staged.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt_us").cast("long").alias("span_us"),
        F.round(
            (F.sum(vdt) / F.sum("dt_us")).cast("decimal(38,12)"), 6
        )
        .cast("double")
        .alias("twa_value"),
    )


DEDUP_WINDOW_MIN = 10  # trailing-debounce window


def event_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54 — WINDOWED EVENT DEDUPLICATION (trailing debounce): an event
    is flagged a RETRANSMISSION if the same (user_id, event_type)
    emitted an event within the preceding DEDUP_WINDOW_MIN minutes —
    the at-least-once-delivery cleanup every event pipeline runs before
    aggregation (the batch analog of Structured Streaming's
    dropDuplicatesWithinWatermark state-TTL dedup; the trailing rule —
    'within W of the PREVIOUS event, kept or not' — is the
    deterministic, SQL-expressible debounce variant).

    Emits only the flagged rows with their predecessor and the gap (the
    thresholded-output rule — the dups are the deliverable; the kept
    set is the anti-join). Determinism: the per-key order is
    (ts, event_id), so simultaneous events tie-break stably.

    Scale shape: ONE window over (user_id, event_type) — the same key
    a sessionize/funnel shuffle uses; gap arithmetic in exact integer
    microseconds; no self-join (the naive formulation is an
    events×events time-range join)."""
    ev = cached_parquet(spark, f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("t"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    gap_us = F.unix_micros(F.col("t")) - F.unix_micros(F.lag("t").over(w))
    staged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_id").over(w).alias("prev_event_id"),
        gap_us.alias("gap_us"),
    )
    return staged.filter(
        F.col("gap_us") <= DEDUP_WINDOW_MIN * 60 * 1_000_000
    ).select("event_id", "user_id", "event_type", "prev_event_id", "gap_us")


def ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56 — OHLC DOWNSAMPLING: per (user, hour) open/high/low/close
    bars over the irregular value stream — the canonical time-series
    resample (TimescaleDB's candlestick_agg / kdb's xbar-first-last
    shape) that turns raw ticks into the fixed-rate series charts and
    models consume.

    Exactness: every output is a SELECTION (first/last by the total
    (ts, event_id) order, min/max) — no float arithmetic at all, so
    the oracle hash cannot drift under any merge order. One window +
    one aggregation on the same (user, hour) key — the window rides
    the aggregation's shuffle."""
    ev = cached_parquet(spark, f"{sf_dir}/events.parquet").select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("t"),
        "value",
    )
    hour = F.date_trunc("hour", F.col("t")).alias("hour_start")
    w = Window.partitionBy("user_id", hour).orderBy("t", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    staged = ev.select(
        "user_id",
        hour,
        "value",
        F.first("value").over(wfull).alias("open"),
        F.last("value").over(wfull).alias("close"),
    )
    return staged.groupBy("user_id", "hour_start").agg(
        F.first("open").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.first("close").alias("close"),
        F.count("*").alias("n_ticks"),
    )


Z_THRESHOLD = 3.0  # |z| flag level
MIN_N = 10         # users below this sample size are not scored


def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B57 — Z-SCORE OUTLIER DETECTION per user: flag events whose
    value deviates more than Z_THRESHOLD sample standard deviations
    from that user's mean — the monitoring/anomaly staple over any
    metric stream.

    Determinism (the q15 rule): Σv and Σv² accumulate in DECIMAL —
    exact, order-independent — and the variance/std/z arithmetic
    happens ONCE per user/event on those exact sums (sample variance =
    (n·Σv² − (Σv)²) / (n·(n−1))); z rounds to 6. A float sum would
    drift the boundary cases by merge order. Users with fewer than
    MIN_N events are skipped (a 2-event user flags nothing
    meaningfully).

    Scale shape: one groupBy(user) over decimal partials (map-side
    combinable) + one broadcast-or-shuffle join back on the same key;
    output is only the flagged rows (thresholded-output rule)."""
    ev = cached_parquet(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    dv = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(dv).cast("decimal(38,6)").alias("s1"),
        F.sum((dv * dv).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("s2"),
    ).filter(F.col("n") >= MIN_N)
    j = ev.join(stats, "user_id")
    # the DECIMAL part is only the order-independent sums; all
    # downstream arithmetic runs in DOUBLE with the same operation
    # sequence both engines execute (decimal division would round at
    # engine-specific intermediate scales)
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    mean = s1d / nd
    var = (nd * s2d - s1d * s1d) / (nd * (nd - F.lit(1.0)))
    std = F.sqrt(var)
    z = F.round((F.col("value") - mean) / std, 6)
    return (
        j.select(
            "event_id",
            "user_id",
            "value",
            F.round(mean, 6).alias("user_mean"),
            F.round(std, 6).alias("user_std"),
            z.alias("z"),
        )
        .filter((F.col("user_std") > 0) & (F.abs("z") > Z_THRESHOLD))
    )


QUERIES = {
    "rel_gap_fill_locf": gap_fill_locf,
    "rel_time_weighted_avg": time_weighted_avg,
    "rel_event_dedup_window": event_dedup_window,
    "rel_ohlc_resample": ohlc_resample,
    "rel_value_outliers": value_outliers,
}

ORACLES = {
    "rel_gap_fill_locf": """
        WITH obs AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   max_by(value, event_id) AS obs_value
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
            FROM obs GROUP BY user_id
        ),
        days AS (
            SELECT user_id,
                   unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM span
        )
        SELECT d.user_id, d.day,
               last_value(o.obs_value IGNORE NULLS)
                   OVER (PARTITION BY d.user_id ORDER BY d.day
                         ROWS UNBOUNDED PRECEDING) AS value,
               o.obs_value IS NOT NULL AS is_observed
        FROM days d
        LEFT JOIN obs o ON o.user_id = d.user_id AND o.day = d.day
    """,
    "rel_time_weighted_avg": """
        WITH staged AS (
            SELECT user_id, value,
                   epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))
                   - epoch_us(ts) AS dt_us
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(dt_us) AS BIGINT) AS span_us,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6)) * dt_us)
                          / SUM(dt_us), 6) AS DOUBLE) AS twa_value
        FROM staged WHERE dt_us IS NOT NULL
        GROUP BY user_id
    """,
    "rel_event_dedup_window": f"""
        WITH staged AS (
            SELECT event_id, user_id, event_type,
                   LAG(event_id) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id)
                       AS prev_event_id,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id)) AS gap_us
            FROM events
        )
        SELECT event_id, user_id, event_type, prev_event_id, gap_us
        FROM staged
        WHERE gap_us <= {DEDUP_WINDOW_MIN} * 60 * 1000000
    """,
    # B56: the identical window formulation — first/last by the
    # (ts, event_id) total order within the (user, hour) frame
    "rel_ohlc_resample": """
        WITH s AS (
            SELECT user_id,
                   date_trunc('hour', ts) AS hour_start,
                   value,
                   first_value(value) OVER w AS open,
                   last_value(value) OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS close
            FROM events
            WINDOW w AS (PARTITION BY user_id, date_trunc('hour', ts)
                         ORDER BY ts, event_id)
        )
        SELECT user_id, hour_start,
               FIRST(open) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               FIRST(close) AS close,
               CAST(COUNT(*) AS BIGINT) AS n_ticks
        FROM s
        GROUP BY 1, 2
    """,
    # B57: decimal sums, then the identical double operation sequence
    "rel_value_outliers": f"""
        WITH stats AS (
            SELECT user_id,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6)))
                        AS DECIMAL(38,6)) AS s1,
                   CAST(SUM(CAST(CAST(value AS DECIMAL(18,6))
                                 * CAST(value AS DECIMAL(18,6))
                                 AS DECIMAL(38,12)))
                        AS DECIMAL(38,12)) AS s2
            FROM events GROUP BY user_id
            HAVING COUNT(*) >= {MIN_N}
        ),
        scored AS (
            SELECT e.event_id, e.user_id, e.value,
                   CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean,
                   sqrt((CAST(s.n AS DOUBLE) * CAST(s.s2 AS DOUBLE)
                         - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE))
                        / (CAST(s.n AS DOUBLE)
                           * (CAST(s.n AS DOUBLE) - 1.0))) AS std
            FROM events e JOIN stats s ON e.user_id = s.user_id
        )
        SELECT event_id, user_id, value,
               ROUND(mean, 6) AS user_mean,
               ROUND(std, 6) AS user_std,
               ROUND((value - mean) / std, 6) AS z
        FROM scored
        WHERE ROUND(std, 6) > 0
          AND ABS(ROUND((value - mean) / std, 6)) > {Z_THRESHOLD}
    """,
}


def seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B58 — SEASONALITY PROFILE: mean value and event volume per
    (event_type, hour-of-day, day-of-week) cell — the fixed-size
    seasonal fingerprint dashboards and anomaly baselines consume
    (B57's z-score flags deviations; this is the expected-level table
    they deviate FROM). Means decimal-accumulated then divided once in
    double (the shared-sequence rule); one map-side-combinable
    aggregate, output bounded at types × 24 × 7 regardless of corpus
    size."""
    ev = cached_parquet(spark, f"{sf_dir}/events.parquet")
    t = F.col("ts").cast("timestamp")
    dv = F.col("value").cast("decimal(18,6)")
    g = ev.groupBy(
        "event_type",
        F.hour(t).alias("hour_of_day"),
        # pin day-of-week to ISO Monday=1 (dayofweek() is Sunday=1 and
        # locale-adjacent; both engines define isodow/weekday identically)
        F.expr("extract(dayofweek_iso FROM cast(ts as timestamp))").alias(
            "iso_dow"
        ),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(dv).cast("decimal(38,6)").alias("s1"),
    )
    return g.select(
        "event_type",
        "hour_of_day",
        F.col("iso_dow").cast("int").alias("iso_dow"),
        "n_events",
        F.round(
            F.col("s1").cast("double") / F.col("n_events").cast("double"), 6
        ).alias("mean_value"),
    )


QUERIES["rel_seasonal_profile"] = seasonal_profile
ORACLES["rel_seasonal_profile"] = """
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
           CAST(isodow(ts) AS INT) AS iso_dow,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                           AS DECIMAL(38,6)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_value
    FROM events
    GROUP BY 1, 2, 3
"""
