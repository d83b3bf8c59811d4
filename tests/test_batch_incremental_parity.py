"""Batch ≡ incremental parity harness (D20, VERDICT r4 #2): every
maintained aggregate, driven through restart-per-point incremental
ingestion, must equal the from-scratch recomputation at EVERY quiescent
point — under time-ordered AND adversarial time-shuffled splits (later
batches carrying earlier event ids force genuinely order-independent
merges, the testable analog of the reference's IVC guarantee)."""

from __future__ import annotations

import pytest

from euclid_spark.streaming.parity import SPECS, run_parity
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_pdf(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()


@pytest.mark.parametrize("spec_name", sorted(SPECS))
@pytest.mark.parametrize(
    "shuffle_seed", [None, 7], ids=["ordered", "time_shuffled"]
)
def test_parity_at_every_quiescent_point(
    spark, tmp_path, events_pdf, spec_name, shuffle_seed
):
    results = run_parity(
        spark,
        events_pdf,
        SPECS[spec_name],
        str(tmp_path),
        n_splits=3,
        shuffle_seed=shuffle_seed,
    )
    assert len(results) == 3
    for r in results:
        assert r.n_rows > 0
        if not r.matched:
            diff = r.view.compare(r.batch) if r.view.shape == r.batch.shape \
                else f"shape {r.view.shape} vs {r.batch.shape}"
            pytest.fail(
                f"{spec_name} diverged at quiescent point {r.point}:\n{diff}"
            )
