"""The standalone response verifier (tools/verify_response.py) — the
groth16-framework src/verifier analog: a consumer checks a PUBLISHED
response with no Spark and none of the prover's code. Tests: the tool
validates untampered artifacts, and each tamper class (payload, leaf
hash, path, root, every binding field) flips the verdict."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb
import pytest

from tests.conftest import REPO, SF_SMOKE

sys.path.insert(0, str(REPO / "tools"))

import verify_response as vr  # noqa: E402


@pytest.fixture(scope="module")
def responses(spark):
    """Ensure published responses exist for the smoke corpus (build via
    the prover side once; the tool itself never touches Spark)."""
    from euclid_spark.operators.merkle import (
        _serve_erc20_response,
        _serve_q2_response,
    )

    _serve_q2_response(spark, SF_SMOKE).count()
    _serve_erc20_response(spark, SF_SMOKE).count()
    targets = vr._discover(str(REPO / ".artifacts"), SF_SMOKE)
    assert {k for _, k in targets} == {"q2", "erc20"}
    return dict((k, p) for p, k in targets)


def _events() -> str:
    return os.path.join(SF_SMOKE, "events.parquet")


def _tamper(src: str, tmpdir: str, set_expr: str) -> str:
    """Copy a response artifact with one field rewritten."""
    out = os.path.join(tmpdir, "tampered.parquet")
    os.makedirs(out, exist_ok=True)
    duckdb.execute(
        f"COPY (SELECT * REPLACE ({set_expr}) "
        f"FROM read_parquet('{src}/*.parquet')) "
        f"TO '{out}/part-0.parquet' (FORMAT PARQUET)"
    )
    return out


def test_untampered_responses_verify(responses):
    for kind, path in responses.items():
        v = vr.verify(path, kind, _events())
        assert v["verdict"] == "VALID", v
        assert v["valid_rows"] == v["rows"] > 0


def test_cli_discovery_mode_exit_zero(responses):
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "verify_response.py"), SF_SMOKE],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert {x["kind"] for x in lines} == {"q2", "erc20"}
    assert all(x["verdict"] == "VALID" for x in lines)


@pytest.mark.parametrize(
    "kind,set_expr,check",
    [
        # payload tamper: claimed key no longer hashes to the leaf
        ("q2", "(token_id + 1) AS token_id", "leaf_ok"),
        ("erc20", "(event_id + 1) AS event_id", "leaf_ok"),
        # erc20 payload includes the per-entry reward
        (
            "erc20",
            "(substr(entry_reward_hex, 1, 63) || 'f') AS entry_reward_hex",
            "leaf_ok",
        ),
        # leaf-hash tamper: breaks the leaf↔payload binding
        ("q2", "sha256(leaf_hash) AS leaf_hash", "leaf_ok"),
        # path tamper: refold no longer reaches the root (corrupt a
        # sibling hex; single-leaf groups have empty paths, left as-is)
        (
            "q2",
            "(CASE WHEN path = '' THEN path "
            "ELSE substr(path, 1, 3) || 'ff' || substr(path, 6) END) AS path",
            "root_ok",
        ),
        ("erc20", "sha256(root) AS root", "root_ok"),
        ("q2", "sha256(root) AS root", "root_ok"),
        # binding tampers: every public-input field is checked
        ("q2", "(min_block + 1) AS min_block", "binding_ok"),
        ("q2", "(max_block - 1) AS max_block", "binding_ok"),
        ("q2", "(range_digest + 1) AS range_digest", "binding_ok"),
        ("erc20", "(range_digest + 1) AS range_digest", "binding_ok"),
        ("erc20", "(rewards_rate + 1) AS rewards_rate", "binding_ok"),
    ],
)
def test_tamper_flagged(responses, tmp_path, kind, set_expr, check):
    tampered = _tamper(responses[kind], str(tmp_path), set_expr)
    v = vr.verify(tampered, kind, _events())
    assert v["verdict"] == "INVALID", v
    assert check in v["failed"], v
    # rows whose tampered field happens to be a no-op may stay valid;
    # at least one row must be flagged on the targeted check
    assert len(v["failed"][check]) > 0


def test_wrong_corpus_binding_rejected(responses):
    """A response published from another corpus fails binding — the
    public-input recompute is what ties a response to ITS corpus."""
    v = vr.verify(
        responses["q2"], "q2", "/root/testdata/sf0.01/events.parquet"
    )
    assert v["verdict"] == "INVALID"
    assert "binding_ok" in v["failed"]
