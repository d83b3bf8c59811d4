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
    _PROFILE_LC_BITS,
    _spec_from_parquet,
    table_profile,
)
from tests.conftest import SF_SMOKE

# the derived lineitem spec — what _PROFILE_COLS used to hardcode
_LINEITEM_SPEC = _spec_from_parquet(f"{SF_SMOKE}/lineitem.parquet")


def _by_col(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_sketch_estimate_within_lc_error(spark):
    """The audit the modes exist for: for EVERY column, sketch mode's
    estimate vs exact mode's count, within linear counting's standard
    error (~sqrt(m·(e^t − t − 1))/m per Whang et al.; generous 5σ+1)."""
    exact = _by_col(table_profile(spark, SF_SMOKE, "exact"))
    sketch = _by_col(table_profile(spark, SF_SMOKE, "sketch"))
    m = _PROFILE_LC_BITS
    for c, _, _ in _LINEITEM_SPEC:
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
    for c, _, automode in _LINEITEM_SPEC:
        for k in ("n_rows", "n_nulls", "min_s", "max_s", "mean"):
            assert auto[c][k] == exact[c][k], (c, k)
        assert auto[c]["d_mode"] == automode
        if automode == "exact":
            assert auto[c]["n_distinct"] == exact[c]["n_distinct"]
            assert auto[c]["distinct_est"] is None
        else:
            assert auto[c]["n_distinct"] is None
            assert auto[c]["distinct_est"] is not None


def test_auto_plan_branches_no_highcard_distinct_shuffle(spark):
    """The fused plan's contract (r14): one pruned parquet scan for the
    row-stats fold (always), one for the exact count-distincts, ONE
    PER SKETCHED COLUMN (single-distinct two-level hash aggs — the r12
    multi-distinct sketch branch Expanded every row ×(n_sketched+1),
    which cost 2.2 s against the singles' 1.0 s at sf0.1 and reads the
    same total bytes under column pruning), and one for the string
    min/max fold; no KEYED SortAggregate anywhere (string buffers only
    appear in the keyless fold, so every keyed aggregate
    hash-aggregates under codegen); and no aggregate keyed on a
    sketched column's RAW value — a sketched value only ever reaches a
    grouping key through its bounded LC bit expression (≤ m distinct
    keys at any row count)."""
    plan = (
        table_profile(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # expected branch count derived from the fixture's spec, not a
    # hardcoded number (ADVICE r12): a schema without e.g. string
    # columns correctly plans fewer branches.
    expected_scans = (
        1  # row stats, always present
        + any(m == "exact" for _, _, m in _LINEITEM_SPEC)
        + sum(m == "sketch" for _, _, m in _LINEITEM_SPEC)
        + any(k == "str" for _, k, _ in _LINEITEM_SPEC)
    )
    assert plan.count("Scan parquet") == expected_scans, (
        plan.count("Scan parquet"), expected_scans
    )
    # keyless SortAggregate (the string fold: empty key = no sort) is
    # fine; a KEYED one would mean a keyed aggregate lost hashing
    assert not re.search(r"SortAggregate\(key=\[[^\]]", plan)
    keys = re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan)
    # bare sketched-column references as grouping keys = per-raw-value
    # aggregation; inside the pmod/FLOOR bit expression is the design
    offenders = [
        k for k in keys
        if re.search(r"(^|,\s*)l_extendedprice#\d+L?\s*(,|$)", k)
    ]
    assert not offenders, offenders
    # and the sketched column's bit expression IS a key somewhere
    assert any("l_extendedprice" in k and "pmod" in k for k in keys)


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError, match="distinct_mode"):
        table_profile(spark, SF_SMOKE, "bogus")


def test_spec_derivation_schema_only():
    """The spec is derived, not listed: surrogate keys / measures / µs
    timestamps / payload strings sketch; bounded codes stay exact."""
    from euclid_spark.operators.relational import _spec_from_parquet

    ev = dict(
        (c, (k, m))
        for c, k, m in _spec_from_parquet(f"{SF_SMOKE}/events.parquet")
    )
    assert ev["event_id"] == ("num", "sketch")      # *_id surrogate key
    assert ev["user_id"] == ("num", "sketch")
    assert ev["event_type"] == ("str", "exact")     # categorical code
    assert ev["value"] == ("num", "sketch")         # fractional measure
    assert ev["props"] == ("str", "sketch")         # JSON payload
    assert ev["ts"] == ("ts", "sketch")             # µs row-scaling
    li = dict(
        (c, (k, m)) for c, k, m in _LINEITEM_SPEC
    )
    assert li["l_linenumber"] == ("num", "exact")   # small integral code
    assert li["l_returnflag"] == ("str", "exact")
    assert li["l_orderkey"] == ("num", "sketch")    # *key


def test_events_profile_auto_plan_shuffle_clean(spark):
    """The generalized face's contract: pointing the profiler at a table
    with row-scaling keys and a JSON payload must NOT introduce a
    full-width distinct shuffle — no HashAggregate keyed on any sketched
    column; only event_type's bounded exact branch aggregates values."""
    import re as _re

    from euclid_spark.operators.relational import events_profile

    plan = (
        events_profile(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    keys = _re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan)
    for bad in ("event_id", "user_id", "props", "value", "ts"):
        # a BARE reference as a grouping key = per-raw-value
        # aggregation; the column's appearance inside its pmod/md5 bit
        # expression is the bounded sketch path (r12 plan shape)
        offenders = [
            k for k in keys
            if _re.search(rf"(^|,\s*){bad}#\d+L?\s*(,|$)", k)
        ]
        assert not offenders, (bad, offenders)
    # the sketched keys' bit expressions are present
    assert any("pmod" in k or "md5" in k for k in keys), keys
