"""The parameterized public API (VERDICT r7 #5): every Euclid-family
operator exposes (owner, range, L, rate)-style parameters; the pinned
gate faces are one instantiation. Property per operator: the explicit
call at the pinned values equals the face, and a non-pinned value
behaves as specified (scoping / truncation / narrowing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.operators.euclid import (
    OWNER,
    REWARDS_RATE,
    T_MAX,
    T_MIN,
    TOP_L,
    erc20_weighted_sum,
    erc20_weighted_sum_u256,
    q2_distinct_keys,
    q2_revelation_topl,
)
from euclid_spark.operators.merkle import (
    batch_verifiable_responses,
    erc20_verifiable_response,
    verifiable_query_response,
)
from euclid_spark.operators.range_tree import (
    q2_range_tree_topl,
    range_tree_agg,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.toPandas().values.tolist()), key=str)


def test_q2_distinct_keys_params(spark):
    face = q2_distinct_keys(spark, SF_SMOKE)
    explicit = q2_distinct_keys(spark, SF_SMOKE, T_MIN, T_MAX)
    assert _rows(face) == _rows(explicit)
    scoped = q2_distinct_keys(spark, SF_SMOKE, owner=OWNER)
    want = face.filter(F.col("owner") == OWNER)
    assert _rows(scoped) == _rows(want)


def test_q2_revelation_params(spark):
    face = q2_revelation_topl(spark, SF_SMOKE)
    explicit = q2_revelation_topl(
        spark, SF_SMOKE, owner=OWNER, t_min=T_MIN, t_max=T_MAX, L=TOP_L
    )
    assert _rows(face) == _rows(explicit)
    # smaller L = prefix of the canonical order
    small = q2_revelation_topl(spark, SF_SMOKE, L=2)
    face_sorted = sorted(r["token_id"] for r in face.collect())
    assert sorted(r["token_id"] for r in small.collect()) == face_sorted[:2]
    # a different owner returns that owner's keys
    other = q2_revelation_topl(spark, SF_SMOKE, owner=OWNER + 1)
    keys = q2_distinct_keys(spark, SF_SMOKE, owner=OWNER + 1).filter(
        F.col("token_id").isNotNull()
    )
    want = sorted(r["token_id"] for r in keys.collect())[:TOP_L]
    assert sorted(r["token_id"] for r in other.collect()) == want


def test_erc20_weighted_sum_params(spark):
    face = erc20_weighted_sum(spark, SF_SMOKE)
    explicit = erc20_weighted_sum(
        spark, SF_SMOKE, T_MIN, T_MAX, rewards_rate=REWARDS_RATE
    )
    assert _rows(face) == _rows(explicit)
    # doubling the rate doubles every reward (linear public input)
    double = {
        r["owner"]: r["reward"]
        for r in erc20_weighted_sum(
            spark, SF_SMOKE, rewards_rate=2 * REWARDS_RATE
        ).collect()
    }
    for r in face.collect():
        # both sides round to 4dp AFTER summing, so allow 2 ulps of that
        assert abs(double[r["owner"]] - 2 * r["reward"]) < 3e-4


def test_erc20_u256_params(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "arts"))
    face = erc20_weighted_sum_u256(spark, SF_SMOKE)
    explicit = erc20_weighted_sum_u256(
        spark, SF_SMOKE, rewards_rate=REWARDS_RATE
    )
    assert _rows(face) == _rows(explicit)
    # rate is baked into the leaf artifact: a different rate builds its
    # own fingerprint and yields different (here: strictly larger) sums
    bigger = {
        r["owner"]: int(r["reward_hex"], 16)
        for r in erc20_weighted_sum_u256(
            spark, SF_SMOKE, rewards_rate=REWARDS_RATE * 3
        ).collect()
    }
    for r in face.collect():
        v = int(r["reward_hex"], 16)
        if v > 0:
            assert bigger[r["owner"]] >= v


def test_verifiable_response_params(spark):
    face = verifiable_query_response(spark, SF_SMOKE)
    explicit = verifiable_query_response(spark, SF_SMOKE, OWNER, TOP_L)
    assert _rows(face) == _rows(explicit)
    small = verifiable_query_response(spark, SF_SMOKE, L=2)
    assert small.count() == min(2, face.count())
    batch = batch_verifiable_responses(spark, SF_SMOKE, L=1)
    assert batch.agg(F.max("leaf_pos")).collect()[0][0] == 0


def test_erc20_response_params(spark):
    face = erc20_verifiable_response(spark, SF_SMOKE)
    explicit = erc20_verifiable_response(
        spark, SF_SMOKE, owner=OWNER, L=TOP_L, rewards_rate=REWARDS_RATE
    )
    assert _rows(face) == _rows(explicit)


def test_range_tree_params(spark):
    face_row = range_tree_agg(spark, SF_SMOKE).collect()[0]
    explicit = range_tree_agg(
        spark, SF_SMOKE, b_min=face_row["b_min"], b_max=face_row["b_max"]
    ).collect()[0]
    assert face_row == explicit
    # a sub-range's count is bounded by the full range's
    mid = (face_row["b_min"] + face_row["b_max"]) // 2
    sub = range_tree_agg(
        spark, SF_SMOKE, b_min=face_row["b_min"], b_max=mid
    ).collect()[0]
    assert 0 <= sub["n_events"] <= face_row["n_events"]
    # and q2 over the tile tree at the same explicit bounds == its face
    f2 = q2_range_tree_topl(spark, SF_SMOKE)
    e2 = q2_range_tree_topl(
        spark, SF_SMOKE, b_min=face_row["b_min"], b_max=face_row["b_max"]
    )
    assert _rows(f2) == _rows(e2)


def test_sim_range_search_params(spark):
    from euclid_spark.operators.similarity import SIM_TAU, sim_range_search

    face = sim_range_search(spark, SF_SMOKE)
    explicit = sim_range_search(spark, SF_SMOKE, tau=SIM_TAU)
    assert _rows(face) == _rows(explicit)
    # a higher threshold returns a subset of the face's matches
    tight = sim_range_search(spark, SF_SMOKE, tau=SIM_TAU + 0.05)
    face_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in face.collect()
    }
    tight_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in tight.collect()
    }
    assert tight_pairs <= face_pairs
    assert len(tight_pairs) < len(face_pairs)


def test_contract_param_pinned_equals_face(spark):
    """The contract-address input (r9): contract=None ≡ the pinned
    CONTRACT on every param-API entry point, and a non-default contract
    actually changes the scanned entry stream."""
    from euclid_spark.operators.euclid import (
        CONTRACT,
        erc20_weighted_sum,
        q2_distinct_keys,
    )

    pinned = _rows(q2_distinct_keys(spark, SF_SMOKE))
    explicit = _rows(q2_distinct_keys(spark, SF_SMOKE, contract=CONTRACT))
    assert pinned == explicit
    alt = _rows(q2_distinct_keys(spark, SF_SMOKE, contract="click"))
    assert alt != pinned
    assert _rows(erc20_weighted_sum(spark, SF_SMOKE)) == _rows(
        erc20_weighted_sum(spark, SF_SMOKE, contract=CONTRACT)
    )


def test_contract_param_through_tile_artifacts(spark):
    """The deepest thread: a non-default contract must serve ITS OWN
    key-tile tree (per-contract fingerprint) and answer A26 from it —
    equal to recomputing A2 over that contract's entries in range."""
    from euclid_spark.operators.contract_param import (
        ALT_CONTRACT,
        q2_range_tree_topl_alt,
    )
    from euclid_spark.operators.euclid import CONTRACT, q2_distinct_keys
    from euclid_spark.operators.range_tree import q2_range_tree_topl

    face = q2_range_tree_topl_alt(spark, SF_SMOKE)
    rows = face.collect()
    assert rows, "alt-contract tile face returned nothing"
    b_min = rows[0]["b_min"]
    b_max = rows[0]["b_max"]
    # pinned ≡ explicit through the tile path too
    assert _rows(q2_range_tree_topl(spark, SF_SMOKE)) == _rows(
        q2_range_tree_topl(spark, SF_SMOKE, contract=CONTRACT)
    )
    # the alt tree's revealed keys differ from the pinned contract's
    pinned_rows = q2_range_tree_topl(
        spark, SF_SMOKE, b_min=b_min, b_max=b_max
    ).collect()
    assert {(r["owner"], r["token_id"]) for r in rows} != {
        (r["owner"], r["token_id"]) for r in pinned_rows
    }
    assert ALT_CONTRACT != CONTRACT
