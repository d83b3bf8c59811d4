"""B55 table profile: the distinct_mode switch (VERDICT r7 #4) — the
sketch estimate must sit inside linear counting's error envelope of the
exact count, the modes must agree on everything except the distinct
columns, and the auto plan must contain no per-key aggregation on the
sketched high-cardinality column (the 100 TB hazard the switch
removes)."""

from __future__ import annotations

import math
import re

import pytest

from euclid_spark.operators.relational import (
    _PROFILE_COLS,
    _PROFILE_LC_BITS,
    table_profile,
)
from tests.conftest import SF_SMOKE


def _by_col(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_sketch_estimate_within_lc_error(spark):
    """The audit the modes exist for: for EVERY column, sketch mode's
    estimate vs exact mode's count, within linear counting's standard
    error (~sqrt(m·(e^t − t − 1))/m per Whang et al.; generous 5σ+1)."""
    exact = _by_col(table_profile(spark, SF_SMOKE, "exact"))
    sketch = _by_col(table_profile(spark, SF_SMOKE, "sketch"))
    m = _PROFILE_LC_BITS
    for c, _, _ in _PROFILE_COLS:
        d = exact[c]["n_distinct"]
        est = sketch[c]["distinct_est"]
        assert est is not None, f"{c}: sketch estimate missing"
        assert d / m < 0.7, f"{c}: load factor too high for the m chosen"
        # LC is near-exact at these load factors: 5σ ≈ 5·sqrt(d) bound
        assert abs(est - d) <= max(5 * math.sqrt(max(d, 1)), 10), (
            f"{c}: estimate {est} vs exact {d}"
        )


def test_modes_agree_on_row_local_stats(spark):
    auto = _by_col(table_profile(spark, SF_SMOKE))
    exact = _by_col(table_profile(spark, SF_SMOKE, "exact"))
    for c, _, automode in _PROFILE_COLS:
        for k in ("n_rows", "n_nulls", "min_s", "max_s", "mean"):
            assert auto[c][k] == exact[c][k], (c, k)
        assert auto[c]["d_mode"] == automode
        if automode == "exact":
            assert auto[c]["n_distinct"] == exact[c]["n_distinct"]
            assert auto[c]["distinct_est"] is None
        else:
            assert auto[c]["n_distinct"] is None
            assert auto[c]["distinct_est"] is not None


def test_auto_plan_has_no_highcard_distinct_shuffle(spark):
    """The swapped branch's contract: no hash aggregate anywhere in the
    auto plan keyed on the sketched column (raw or casted) — its only
    aggregation is the fixed-size word bitmap."""
    plan = (
        table_profile(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    keys = re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan)
    offenders = [k for k in keys if "l_extendedprice" in k]
    assert not offenders, offenders
    # and the word bitmap IS there
    assert any("word_idx" in k for k in keys)
    # exact mode, by contrast, does aggregate on the column (via stack)
    plan_exact = (
        table_profile(spark, SF_SMOKE, "exact")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "word_idx" not in plan_exact


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError, match="distinct_mode"):
        table_profile(spark, SF_SMOKE, "bogus")
