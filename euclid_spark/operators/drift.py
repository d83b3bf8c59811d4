"""Data-drift monitoring over the event stream (SURVEY.md §2.B59) —
the distribution-shift check every production ingest pipeline runs
before letting a new window of data into training (PSI — population
stability index, the standard monitoring statistic; public shapes:
Evidently's DataDriftPreset, TFDV's skew/drift validators).

PSI per event_type between a REFERENCE window (the first half of the
corpus's day span) and the CURRENT window (the second half):

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

over B fixed-width value bins whose edges come from the reference
window's own per-type [min, max] (the convention: bin on the baseline,
clamp the current window into it).  p's are Laplace-smoothed
((cnt + 0.5) / (N + B/2)) so empty bins — the strongest drift signal —
contribute finite mass.  Bins no row landed in are not materialized:
their per-bin term is a per-type constant, folded in closed form as
(B − bins_present) · term(0, 0) — identical mass to a dense B-bin
grid, without the grid.

Determinism: bin assignment is a shared double operation sequence
(identical IEEE ops in both engines — the B57 rule); each bin's PSI
term is ROUND(·, 9) then DECIMAL-accumulated so the B-term sum is
order-independent (the libm-ln precedent of the B48 linear-counting
estimate); the final PSI is ROUND(·, 6).  Hash-checked end to end.

Scale shape (the r13 plan lesson: a first draft that re-referenced a
shared events subframe planned TWENTY scans — every DataFrame re-use
re-expands its lineage): the split day comes from PARQUET FOOTER
STATISTICS (O(row groups) metadata, never a data scan — the stat_max
discipline), the reference bounds are ONE scan whose ts < split
predicate PUSHES DOWN to the parquet reader (row-group / partition
pruning: at 100 TB the baseline window is usually a thin recent
slice), and the binning is ONE more scan into a groupBy on
(event_type, bin) — ≤ types × B groups whatever the row count.  The
per-type totals ride a window PARTITIONED BY event_type over that
bounded aggregate.  Exactly TWO data scans, no keyless window, no
SinglePartition exchange (plan-asserted in tests/test_drift.py).
"""

from __future__ import annotations

import datetime as _dt
import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from euclid_spark import catalog

PSI_BINS = 16
PSI_ALERT = 0.1  # the conventional "moderate shift, investigate" bar


def _event_day_span(spark: SparkSession, sf_dir: str):
    """[min, max] event day from parquet FOOTER statistics (nulls are
    excluded from parquet min/max by spec, matching the oracle's
    ts IS NOT NULL). Falls back to a one-row Spark fold if any footer
    lacks ts stats (same value either way)."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    def _from_footers():
        lo = hi = None
        for p in files:
            md = pq.ParquetFile(p).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(rg.num_columns):
                    c = rg.column(j)
                    if c.path_in_schema != "ts":
                        continue
                    st = c.statistics
                    if st is None or not st.has_min_max:
                        return None, None  # any statless group: fall back
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        return lo, hi

    lo, hi = _from_footers()
    if lo is None or hi is None:  # footer without stats: one bounded fold
        row = (
            spark.read.parquet(path)
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
            .collect()[0]
        )
        lo, hi = row["lo"], row["hi"]
    if lo is None:
        return None, None
    if isinstance(lo, _dt.datetime):
        lo, hi = lo.date(), hi.date()
    return lo, hi


def data_drift_psi(
    spark: SparkSession,
    sf_dir: str,
    split_day: "str | _dt.date | None" = None,
    bins: int = PSI_BINS,
    alert: float = PSI_ALERT,
) -> DataFrame:
    """B59 — per-event_type PSI between the corpus's two half-windows.
    Emits (event_type, n_ref, n_cur, psi, drifted); types with no
    reference-window rows are skipped (PSI needs a baseline).

    Parameterized (the §4 discipline — the gate face is the pinned
    default instantiation, property-tested equal in tests/test_drift.py):
    `split_day` sets the reference/current boundary explicitly (ISO
    string or date; default = the corpus day-span midpoint from footer
    stats), `bins` the bin count, `alert` the drifted threshold."""
    if split_day is None:
        d0, d1 = _event_day_span(spark, sf_dir)
        if d0 is None:  # empty corpus: no types, stable schema
            split = _dt.date(1970, 1, 1)
        else:
            split = d0 + _dt.timedelta(days=(d1 - d0).days // 2)
    else:
        split = (
            _dt.date.fromisoformat(split_day)
            if isinstance(split_day, str)
            else split_day
        )
    split_lit = F.to_date(F.lit(split.isoformat()))

    # scan 1: per-type reference bounds — the ts < split predicate is
    # applied on the STORED column (load_events), so it reaches the
    # parquet reader as a pushed filter
    bounds = (
        catalog.load_events(spark, sf_dir, t_max=split.isoformat())
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        .withColumn(
            "width",
            F.when(
                F.col("vmax") > F.col("vmin"),
                (F.col("vmax") - F.col("vmin")) / F.lit(float(bins)),
            ).otherwise(F.lit(1.0)),
        )
    )

    # scan 2: row-local bin assignment, bounded (type, bin) groups with
    # the ref/cur split folded as conditional counts — one aggregate,
    # no side dimension, no per-side re-reference
    ev = (
        catalog.load_events(spark, sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(F.to_date("ts").alias("day"), "event_type", "value")
    )
    bin_col = F.least(
        F.lit(bins - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((F.col("value") - F.col("vmin")) / F.col("width")),
        ),
    )
    is_ref = F.col("day") < split_lit
    perbin = (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_type", bin_col.alias("bin"), is_ref.alias("is_ref"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("cnt_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("cnt_cur"),
        )
    )

    # totals via a window PARTITIONED on the type key, over the bounded
    # (type, bin) aggregate — never the raw rows
    w = Window.partitionBy("event_type")
    half_b = float(bins) / 2.0
    with_tot = perbin.select(
        "*",
        F.sum("cnt_ref").over(w).alias("n_ref"),
        F.sum("cnt_cur").over(w).alias("n_cur"),
    )

    def _term(cr, cc):
        pr = (cr + F.lit(0.5)) / (F.col("n_ref") + F.lit(half_b))
        pc = (cc + F.lit(0.5)) / (F.col("n_cur") + F.lit(half_b))
        return F.round((pc - pr) * F.log(pc / pr), 9).cast("decimal(38,9)")

    terms = with_tot.select(
        "event_type",
        "n_ref",
        "n_cur",
        _term(F.col("cnt_ref"), F.col("cnt_cur")).alias("term"),
        # the closed-form per-type constant every ABSENT bin contributes
        _term(F.lit(0).cast("long"), F.lit(0).cast("long")).alias("term0"),
    )
    # the absent-bin product runs at pinned width: decimal(38,9) × a
    # bare bigint would overflow precision 38 and silently DROP SCALE
    # (Spark's allowPrecisionLoss) — a real 1e-6 drift caught by the
    # oracle on first run
    absent = (F.lit(bins) - F.count(F.lit(1))).cast("decimal(4,0)")
    psi = F.round(
        (
            F.sum("term")
            + absent * F.first("term0").cast("decimal(20,9)")
        ).cast("double"),
        6,
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            psi.alias("psi"),
        )
        .filter(F.col("n_ref") > 0)  # no baseline window → no PSI
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            "psi",
            (F.col("psi") > F.lit(alert)).alias("drifted"),
        )
    )


QUERIES = {
    "rel_data_drift_psi": data_drift_psi,
}

ORACLES = {
    "rel_data_drift_psi": f"""
        WITH sp AS (
            SELECT CAST(MIN(ts) AS DATE)
                   + CAST((CAST(MAX(ts) AS DATE) - CAST(MIN(ts) AS DATE)) // 2
                          AS INTEGER) AS split_day
            FROM events WHERE ts IS NOT NULL
        ),
        ev AS (
            SELECT CAST(ts AS DATE) AS day, event_type, value
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        ),
        bounds AS (
            SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax,
                   CASE WHEN MAX(value) > MIN(value)
                        THEN (MAX(value) - MIN(value)) / {float(PSI_BINS)}
                        ELSE 1.0 END AS width
            FROM ev, sp WHERE day < split_day GROUP BY event_type
        ),
        perbin AS (
            SELECT e.event_type,
                   LEAST({PSI_BINS - 1}, GREATEST(0,
                       CAST(FLOOR((e.value - b.vmin) / b.width) AS BIGINT)
                   )) AS bin,
                   SUM(CASE WHEN e.day < sp.split_day THEN 1 ELSE 0 END)
                       AS cnt_ref,
                   SUM(CASE WHEN e.day < sp.split_day THEN 0 ELSE 1 END)
                       AS cnt_cur
            FROM ev e JOIN bounds b USING (event_type), sp
            GROUP BY 1, 2
        ),
        with_tot AS (
            SELECT *,
                   SUM(cnt_ref) OVER (PARTITION BY event_type) AS n_ref,
                   SUM(cnt_cur) OVER (PARTITION BY event_type) AS n_cur
            FROM perbin
        ),
        terms AS (
            SELECT event_type, n_ref, n_cur,
                   CAST(ROUND(
                       ((cnt_cur + 0.5) / (n_cur + {PSI_BINS / 2.0})
                        - (cnt_ref + 0.5) / (n_ref + {PSI_BINS / 2.0}))
                       * ln(((cnt_cur + 0.5) / (n_cur + {PSI_BINS / 2.0}))
                            / ((cnt_ref + 0.5) / (n_ref + {PSI_BINS / 2.0}))),
                       9) AS DECIMAL(38,9)) AS term,
                   CAST(ROUND(
                       ((0 + 0.5) / (n_cur + {PSI_BINS / 2.0})
                        - (0 + 0.5) / (n_ref + {PSI_BINS / 2.0}))
                       * ln(((0 + 0.5) / (n_cur + {PSI_BINS / 2.0}))
                            / ((0 + 0.5) / (n_ref + {PSI_BINS / 2.0}))),
                       9) AS DECIMAL(38,9)) AS term0
            FROM with_tot
        ),
        agg AS (
            SELECT event_type,
                   MIN(n_ref) AS n_ref, MIN(n_cur) AS n_cur,
                   ROUND(CAST(SUM(term)
                         + CAST({PSI_BINS} - COUNT(*) AS DECIMAL(4,0))
                           * CAST(MIN(term0) AS DECIMAL(20,9))
                         AS DOUBLE), 6) AS psi
            FROM terms GROUP BY 1
        )
        SELECT event_type, CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur, psi,
               psi > {PSI_ALERT} AS drifted
        FROM agg WHERE n_ref > 0
    """,
}
