"""A25 range-tree rollup: the O(log-range) property the operator
exists for — the query must read tile rows ∝ log(range) plus two
< TILE_SIZE edge scans, never the range interior — plus decomposition
correctness on adversarial bounds and result equality vs a full scan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from euclid_spark.catalog import load_events
from euclid_spark.operators.range_tree import (
    TILE_SIZE,
    range_tree_agg,
    serve_range_tree,
    tile_cover,
)
from tests.conftest import SF_SMOKE


def test_cover_is_exact_and_logarithmic():
    """Property: for adversarial (b_min, b_max) the cover partitions
    [b_min, b_max) exactly (tiles disjoint, union complete) and uses at
    most 2 tiles per level + 2 sub-tile edges — the segment-tree bound."""
    s = TILE_SIZE
    max_level = 20
    cases = [
        (0, 1), (0, s), (1, s - 1), (s - 1, s + 1), (0, 37 * s),
        (5, 37 * s + 11), (7 * s + 3, 7 * s + 9), (123, 1 << 22),
        ((1 << 20) - 3, (1 << 21) + 5), (0, (1 << 20) + 1),
    ]
    for b_min, b_max in cases:
        tiles, edges = tile_cover(b_min, b_max, max_level)
        covered = []
        for k, c in tiles:
            covered.append((c * s << k, (c + 1) * s << k))
        for lo, hi in edges:
            assert hi - lo < s, f"edge wider than a tile: {(lo, hi)}"
            covered.append((lo, hi))
        covered.sort()
        # disjoint and contiguous from b_min to b_max
        assert covered[0][0] == b_min
        assert covered[-1][1] == b_max
        for (l1, h1), (l2, h2) in zip(covered, covered[1:]):
            assert h1 == l2, f"gap/overlap at {(h1, l2)} for {(b_min, b_max)}"
        n_cells = (b_max - b_min) // s + 2
        bound = 2 * (max(1, math.ceil(math.log2(max(2, n_cells)))) + 1)
        assert len(tiles) <= bound, (
            f"cover of {(b_min, b_max)} uses {len(tiles)} tiles > "
            f"2·(log₂(cells)+1) = {bound} — not logarithmic"
        )


def test_query_reads_log_tiles_not_range_rows(spark):
    """The scan-shape assertion: the face's tile reads are ≤
    2·(depth+1) rows and its edge scans are < 2·TILE_SIZE blocks,
    while the range itself spans ~60 % of the block space."""
    tiles = serve_range_tree(spark, SF_SMOKE)
    meta = tiles.agg(
        F.max("level").alias("ml"), F.max("max_block").alias("mb")
    ).collect()[0]
    max_level, max_block = int(meta["ml"]), int(meta["mb"])
    b_min, b_max = max_block // 5, max_block * 4 // 5
    cover, edges = tile_cover(b_min, b_max, max_level)
    assert len(cover) <= 2 * (max_level + 1)
    assert sum(hi - lo for lo, hi in edges) < 2 * TILE_SIZE
    # the range interior is orders of magnitude wider than what we read
    assert (b_max - b_min) > len(cover) * 2  # log rows vs range width


def test_result_equals_full_scan(spark):
    """The tile path must return exactly what scanning the rows does
    (the oracle proves this vs DuckDB; this is the in-repo pin)."""
    from euclid_spark.functions.hashing import DIGEST_PRIME, MIX

    row = range_tree_agg(spark, SF_SMOKE).collect()[0]
    ev = load_events(spark, SF_SMOKE)
    ref = (
        ev.filter(
            (F.col("event_id") >= row["b_min"])
            & (F.col("event_id") < row["b_max"])
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("tv"),
            F.min("event_id").alias("mn"),
            F.max("event_id").alias("mx"),
            F.pmod(
                F.sum(
                    (F.col("event_id") * MIX + F.col("user_id") * 97)
                    % DIGEST_PRIME
                ),
                F.lit(DIGEST_PRIME),
            )
            .cast("long")
            .alias("dg"),
        )
        .collect()[0]
    )
    assert row["n_events"] == ref["n"]
    assert row["total_value"] == ref["tv"]
    assert row["min_block"] == ref["mn"]
    assert row["max_block"] == ref["mx"]
    assert row["range_digest"] == ref["dg"]


def test_degenerate_tiny_corpus(spark, tmp_path, monkeypatch):
    """A 2-block corpus (event_ids 0 and 1) makes the probe range
    empty (b_min == b_max == 0): the face must return its typed empty
    frame, matching the oracle's zero rows, not crash on an empty
    cover."""
    from pyspark.sql import Window

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    w = Window.orderBy("event_id")
    src = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .limit(2)
        .withColumn("event_id", F.row_number().over(w).cast("long") - 1)
    )
    out = str(tmp_path / "tiny")
    src.write.parquet(f"{out}/events.parquet")
    got = range_tree_agg(spark, out)
    assert got.count() == 0
    assert "n_events" in got.columns and "range_digest" in got.columns
