"""Z-order (Morton-curve) clustered layout (SURVEY.md §2.D26).

The day-partitioned layout (partitioned.py) prunes ONE dimension; a
query box over TWO dimensions — `user_id BETWEEN … AND ts BETWEEN …`,
the (owner, block-range) shape of every reference query
(mr-plonky2-circuits: Query2 and ERC-20 both scope (owner, [B_min,
B_max])) — still reads every file of each matching day, because within
a file the second dimension is uniformly spread. Z-ordering interleaves
the bits of both dimensions into one sort key, so files become tight
rectangles in (user, time) space: each file's parquet min/max footer
covers a small box, and a 2-D range predicate skips every file whose
box misses it. This is the standard lakehouse clustering technique
(public: Databricks Delta OPTIMIZE ZORDER BY, Apache Iceberg
z-ordering; Morton 1966).

All column-expression arithmetic (the classic bit-spreading magic
numbers), no UDF; the write is one repartitionByRange + local sort —
exactly the cost of any clustered rewrite, amortized over every later
box query. At 100 TB this runs as the compaction/OPTIMIZE job
(compaction.py is the same machinery).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # 16 bits per dimension → 32-bit z-value


def _spread_bits(col: Column) -> Column:
    """Insert a zero between consecutive bits of a 16-bit int
    (0bABCD → 0b0A0B0C0D) — the branch-free Morton spreading with
    magic masks (public-domain bit-twiddling folklore; e.g. Sean
    Anderson's "Bit Twiddling Hacks")."""
    x = col.cast("long").bitwiseAND(F.lit((1 << ZBITS) - 1))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zvalue(a: Column, b: Column) -> Column:
    """Morton interleave of two 16-bit bucket ids: z = spread(a) |
    spread(b) << 1. Adjacent z-values are adjacent in BOTH dimensions
    (±1 quad-tree cell), which is what makes sort-by-z a 2-D
    clustering."""
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


def _bucket16(col: Column, lo: Column, hi: Column) -> Column:
    """Linear map of `col` from [lo, hi] onto the 16-bit bucket grid.
    Equal-width buckets are the cheap choice (one stats row); swap in
    quantile edges for heavily skewed dimensions — the z-math is
    identical either way."""
    span = (hi - lo).cast("double")
    frac = (col - lo).cast("double") / F.when(span > 0, span).otherwise(F.lit(1.0))
    return F.least(
        F.lit((1 << ZBITS) - 1),
        F.floor(frac * F.lit(1 << ZBITS)).cast("long"),
    )


def write_zordered(
    df: DataFrame, out_dir: str, dim_a: str, dim_b: str, n_files: int = 16
) -> None:
    """Rewrite `df` into `n_files` parquet files clustered by the
    z-order of (dim_a, dim_b) — both must be numeric (cast timestamps
    to epoch first). Layout cost: one stats row (broadcast), one range
    exchange, one local sort; every later 2-D box query pays
    proportionally fewer file opens (tests/test_zorder.py measures
    it). The z column is dropped on write — the layout is invisible to
    readers except through the parquet min/max footers."""
    stats = df.agg(
        F.min(dim_a).alias("a_lo"),
        F.max(dim_a).alias("a_hi"),
        F.min(dim_b).alias("b_lo"),
        F.max(dim_b).alias("b_hi"),
    )
    z = zvalue(
        _bucket16(F.col(dim_a), F.col("a_lo"), F.col("a_hi")),
        _bucket16(F.col(dim_b), F.col("b_lo"), F.col("b_hi")),
    )
    (
        df.join(F.broadcast(stats))
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "a_lo", "a_hi", "b_lo", "b_hi")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


# ---------------------------------------------------------------- query face

# the owner half of the 2-D query box — ids dense from 1 at every SF,
# so the box is non-empty at the smoke SF and a ~1 % slice at sf0.1
Z_USER_LO, Z_USER_HI = 3, 11


def serve_zordered_events(spark, sf_dir: str) -> str:
    """The z-ordered events layout as a fingerprint-keyed ARTIFACT
    directory (the ingest/OPTIMIZE-time rewrite, built once per corpus
    version — the day-partitioned layout's 2-D sibling). Clustered on
    (user_id, event time): the (owner, block-range) box every
    reference query scopes."""
    import os
    import shutil

    from euclid_spark import artifacts

    fp = artifacts.corpus_fingerprint(
        [f"{sf_dir}/events.parquet"], op="events_zorder", bits=ZBITS
    )
    path = os.path.join(artifacts.artifact_dir(), f"events_zorder_{fp}.parquet")
    if not os.path.exists(path):
        os.makedirs(artifacts.artifact_dir(), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "ts_epoch", F.col("ts").cast("timestamp").cast("long")
        )
        write_zordered(ev, tmp, "user_id", "ts_epoch")
        try:
            os.rename(tmp, path)
        except OSError:  # concurrent builder won — identical bytes
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def zorder_box_scan(spark, sf_dir: str) -> DataFrame:
    """D26's QUERY FACE (r7): the 2-D (owner-range × block-range) box
    query answered from the served z-ordered layout — the layout whose
    parquet min/max footers make BOTH predicates file-pruning (the
    measured 2-D box pruning of tests/test_zorder.py), while the
    oracle runs the plain filter over the unpartitioned table: layout
    result-invariance, gate-checked (the D10/D18 precedent)."""
    import calendar
    from datetime import datetime

    from euclid_spark.operators.euclid import T_MAX, T_MIN

    def _epoch(d: str) -> int:
        return calendar.timegm(datetime.strptime(d, "%Y-%m-%d").timetuple())

    path = serve_zordered_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    return ev.filter(
        (F.col("user_id") >= Z_USER_LO)
        & (F.col("user_id") <= Z_USER_HI)
        & (F.col("ts_epoch") >= _epoch(T_MIN))
        & (F.col("ts_epoch") < _epoch(T_MAX))
    ).select("event_id", "user_id", "value", "event_type")


def _oracle_box() -> str:
    from euclid_spark.operators.euclid import T_MAX, T_MIN

    return f"""
        SELECT event_id, user_id, value, event_type FROM events
        WHERE user_id BETWEEN {Z_USER_LO} AND {Z_USER_HI}
          AND ts >= TIMESTAMP '{T_MIN}' AND ts < TIMESTAMP '{T_MAX}'
    """


QUERIES = {
    "euclid_zorder_box_scan": zorder_box_scan,
}

ORACLES = {
    "euclid_zorder_box_scan": _oracle_box(),
}
