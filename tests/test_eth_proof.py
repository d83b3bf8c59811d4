"""eth_getProof-shaped ingestion + verification (sources/eth_proof.py)
— the mrp2-utils/src/eth.rs consumer path: real secure-trie storage
proofs, yellow-paper account bodies, hash-chained node lists. Tests:
spec constants, proof round-trips on random tries, the end-to-end face,
and one tamper test per proof component."""

from __future__ import annotations

import pandas as pd
import pytest

from euclid_spark.functions.keccak import keccak256
from euclid_spark.functions.rlp import (
    build_trie,
    rlp_decode,
    rlp_encode,
    to_nibbles,
)
from euclid_spark.sources.eth_proof import (
    CODE_HASH,
    _int_be,
    _unhex,
    _verify_batches,
    account_address,
    eth_proof_fixture,
    eth_proof_verify,
    extract_proof,
    storage_location,
    verify_proof,
)
from tests.conftest import SF_SMOKE


def test_spec_constants():
    """Well-known Ethereum constants (public spec vectors)."""
    from euclid_spark.functions.rlp import EMPTY_ROOT

    assert EMPTY_ROOT.hex() == (
        "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421"
    )
    assert CODE_HASH.hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_proof_roundtrip_random_trie():
    """extract_proof → verify_proof closes the loop on every key of a
    random secure trie (incl. embedded <32-byte nodes)."""
    entries = {
        keccak256(storage_location(t)): rlp_encode(_int_be(t))
        for t in range(1, 60)
    }
    root, nodes = build_trie(entries)
    for t in range(1, 60):
        path = to_nibbles(keccak256(storage_location(t)))
        proof = extract_proof(root, path, nodes)
        ok, val = verify_proof(root, path, proof)
        assert ok, t
        assert rlp_decode(val) == _int_be(t)


def test_absent_key_does_not_verify():
    entries = {
        keccak256(storage_location(t)): rlp_encode(_int_be(t))
        for t in (1, 2, 3)
    }
    root, nodes = build_trie(entries)
    path = to_nibbles(keccak256(storage_location(999)))
    proof = extract_proof(root, path, nodes)
    ok, _ = verify_proof(root, path, proof)
    assert not ok


def test_wrong_root_rejected():
    entries = {keccak256(storage_location(1)): rlp_encode(_int_be(1))}
    root, nodes = build_trie(entries)
    path = to_nibbles(keccak256(storage_location(1)))
    proof = extract_proof(root, path, nodes)
    bad_root = keccak256(root)
    ok, _ = verify_proof(bad_root, path, proof)
    assert not ok


def test_face_all_valid_and_matches_corpus(spark):
    out = eth_proof_verify(spark, SF_SMOKE).collect()
    assert len(out) > 0
    assert all(r["valid"] and r["account_ok"] and r["storage_ok"] for r in out)
    # the proven balance is the proven storage sum (built that way; the
    # verifier derives both independently — one from the account body,
    # one from the storage leaves)
    assert all(r["balance"] == r["storage_sum"] for r in out)
    assert all(r["nonce"] == r["n_storage"] for r in out)


@pytest.mark.parametrize(
    "mutate,broken",
    [
        # account-proof node tampered → hash chain breaks
        (
            lambda r: r.update(
                accountProof=["0xff" + r["accountProof"][0][4:]]
                + r["accountProof"][1:]
            ),
            "account_ok",
        ),
        # claimed balance inflated → decoded-vs-claimed check flags it
        (lambda r: r.update(balance="0xffffffff"), "account_ok"),
        # storage proof node tampered → that slot fails
        (
            lambda r: r.update(
                storage_proofs=[
                    ["0xff" + p[0][4:]] + p[0:0] + p[1:]
                    for p in r["storage_proofs"]
                ]
            ),
            "storage_ok",
        ),
        # claimed storage value changed → value binding fails
        (
            lambda r: r.update(
                storage_values=["0xff"] + r["storage_values"][1:]
            ),
            "storage_ok",
        ),
        # state root swapped → nothing verifies
        (
            lambda r: r.update(stateRoot="0x" + "ab" * 32),
            "account_ok",
        ),
    ],
)
def test_tamper_flagged(spark, mutate, broken):
    row = eth_proof_fixture(spark, SF_SMOKE).limit(1).collect()[0].asDict()
    mutate(row)
    out = list(_verify_batches(iter([pd.DataFrame([row])])))[0].iloc[0]
    assert not out["valid"]
    assert not out[broken]


def test_fixture_is_rpc_shaped(spark):
    """The capture carries the eth_getProof wire fields as 0x-hex."""
    r = eth_proof_fixture(spark, SF_SMOKE).limit(1).collect()[0]
    for f in ("address", "nonce", "balance", "storageHash", "stateRoot"):
        assert r[f].startswith("0x")
    assert len(_unhex(r["address"])) == 20
    assert len(_unhex(r["stateRoot"])) == 32
    assert all(p.startswith("0x") for p in r["accountProof"])
    assert r["address"] == "0x" + account_address(r["user_id"]).hex()


def test_proof_roundtrip_property():
    """Property: for random key sets (random sizes, random 64-bit ids —
    arbitrary trie shapes incl. deep branch/extension mixes), every
    present key's extracted proof verifies with the right value, every
    absent key fails, and the TOOL's restated walker agrees with the
    engine's on both."""
    import random
    import sys

    sys.path.insert(0, "tools")
    import verify_response as vr

    rng = random.Random(0xE7A)
    for _ in range(12):
        toks = sorted(
            rng.sample(range(1, 1 << 48), rng.randint(1, 120))
        )
        entries = {
            keccak256(storage_location(t)): rlp_encode(_int_be(t))
            for t in toks
        }
        root, nodes = build_trie(entries)
        probe = rng.sample(toks, min(8, len(toks)))
        for t in probe:
            path = to_nibbles(keccak256(storage_location(t)))
            proof = extract_proof(root, path, nodes)
            ok, val = verify_proof(root, path, proof)
            assert ok and rlp_decode(val) == _int_be(t)
            ok2, val2 = vr._walk_mpt(root, path, proof)
            assert ok2 and val2 == val
        absent = rng.randrange(1 << 48, 1 << 49)
        path = to_nibbles(keccak256(storage_location(absent)))
        proof = extract_proof(root, path, nodes)
        assert not verify_proof(root, path, proof)[0]
        assert not vr._walk_mpt(root, path, proof)[0]


def test_tool_keccak_agrees_with_engine_on_random_blobs():
    """The tool's restated keccak ≡ the engine's on random inputs of
    every padding-relevant length (…, rate-1, rate, rate+1)."""
    import random
    import sys

    sys.path.insert(0, "tools")
    import verify_response as vr

    rng = random.Random(7)
    lens = [0, 1, 55, 56, 135, 136, 137, 271, 272, 300]
    for n in lens:
        blob = bytes(rng.randrange(256) for _ in range(n))
        assert vr._keccak256(blob) == keccak256(blob), n


def test_graft_subtries_matches_single_build():
    """The distributed state-trie fold is CANONICAL: for corpora of
    1..400 accounts, prefix-partitioned sub-tries merged by
    graft_subtries produce byte-identical roots AND byte-identical
    per-key proofs vs the single-process build_trie — covering every
    graft shape (re-pathed leaf for singleton prefixes, extension over
    a branch sub-root, plain reuse under a full top branch)."""
    from euclid_spark.functions.rlp import build_tries_batch, graft_subtries

    def body(i: int) -> bytes:
        return rlp_encode(
            [bytes([i % 250 + 1]), b"\x02", keccak256(b"sr%d" % i), CODE_HASH]
        )

    shapes = set()
    for n in (1, 2, 3, 5, 17, 60, 400):
        entries = {
            keccak256(b"k%d" % i): body(i) for i in range(n)
        }
        full_root, full_nodes = build_trie(entries)
        by_pref: "dict[int, dict]" = {}
        for k, v in entries.items():
            by_pref.setdefault(k[0], {})[k[1:]] = v
        prefs = sorted(by_pref)
        subs = build_tries_batch([by_pref[p] for p in prefs])
        root_ref, per_prefix = graft_subtries(
            [
                (to_nibbles(bytes([p])), sub[1][sub[0]])
                for p, sub in zip(prefs, subs)
            ]
        )
        assert root_ref == full_root, n
        for p, (sroot, snodes) in zip(prefs, subs):
            chain, repl = per_prefix[tuple(to_nibbles(bytes([p])))]
            shapes.add(
                ("repl" if repl is not None else "reuse", len(chain))
            )
            for k in by_pref[p]:
                sub_proof = extract_proof(sroot, to_nibbles(k), snodes)
                grafted = (
                    chain
                    + [repl if repl is not None else sub_proof[0]]
                    + sub_proof[1:]
                )
                assert grafted == extract_proof(
                    full_root, to_nibbles(bytes([p]) + k), full_nodes
                ), (n, p)
    # the test corpus must have exercised both graft kinds
    assert any(s[0] == "repl" for s in shapes)
    assert any(s[0] == "reuse" for s in shapes)


def test_graft_subtries_empty_and_guards():
    from euclid_spark.functions.rlp import EMPTY_ROOT, graft_subtries

    root, chains = graft_subtries([])
    assert root == EMPTY_ROOT and chains == {}
    with pytest.raises(ValueError):  # embedded sub-root refused
        graft_subtries([([0, 1], rlp_encode([b"\x20", b"\x01"]))])


def test_capture_path_has_no_unbounded_collect():
    """The r11 `weak`: the capture built the state trie from
    accounts.collect() on the driver. The only collect left in the
    capture path is the per-prefix sub-root fold — bounded by the 256
    possible address-byte prefixes regardless of |accounts|."""
    import inspect

    from euclid_spark.sources import eth_proof as mod

    src = inspect.getsource(mod.eth_proof_fixture)
    assert "accounts.collect" not in src
    assert src.count(".collect()") == 1
    assert 'acc2.groupBy("prefix")' in src  # the bounded per-prefix fold


# ------------------------------------------- recorded wire-JSON fixture ---


@pytest.fixture(scope="module")
def wire_df(spark):
    from euclid_spark.sources.eth_proof import eth_proof_from_json
    from tests.conftest import REPO

    return eth_proof_from_json(
        spark, str(REPO / "tests" / "fixtures" / "eth_getproof_recorded.json")
    ).toPandas()


def test_wire_json_normalization(wire_df):
    """The reader absorbs the RPC quirks: EIP-55 mixed case →
    lowercase, QUANTITY hex ("0x0", odd-length "0x1b3") → even-length
    minimal bytes, unpadded echoed keys ("0x1") → the 32-byte slot key."""
    pdf = wire_df
    assert all(a == a.lower() for a in pdf["address"])
    assert set(pdf["nonce"]) == {"0x02", "0x"}
    assert "0x01b3" in set(pdf["balance"])
    keys = [k for ks in pdf["storage_keys"] for k in ks]
    assert all(len(k) == 66 for k in keys)  # 32-byte padded
    assert "0x" + "1".zfill(64) in keys


def test_wire_json_verifies_end_to_end(wire_df):
    """The recorded capture verifies with ZERO downstream change —
    the swap-builder-for-RPC claim: account proofs chain from the
    header's state root, storage inclusion proofs check, and the
    value-0x0 entries (absent key on a populated trie; any key on an
    empty trie) verify as EXCLUSION proofs, the real RPC semantic."""
    out = pd.concat(_verify_batches(iter([wire_df])), ignore_index=True)
    assert len(out) == 3
    assert out["valid"].all() and out["account_ok"].all()
    # zero-value slots are proven absent, not counted as storage
    assert sorted(out["n_storage"]) == [0, 1, 2]
    assert set(out["storage_sum"]) == {0, 0x64 + 0x1, 0x2540BE400}
    assert sorted(out["nonce"]) == [0, 0, 2]
    assert set(out["balance"]) == {0, 0x1B3, 0x29A2241AF62C0000}


def test_wire_json_verifies_in_standalone_tool(spark, wire_df, tmp_path):
    """The no-Spark consumer validates the recorded capture too."""
    import sys as _sys

    from tests.conftest import REPO

    _sys.path.insert(0, str(REPO / "tools"))
    import verify_response as vr

    p = str(tmp_path / "wire_capture.parquet")
    spark.createDataFrame(wire_df).write.parquet(p)
    v = vr.verify_eth(p)
    assert v["verdict"] == "VALID" and v["valid_rows"] == 3, v


def test_wire_json_tampered_zero_value_rejected(wire_df):
    """An exclusion claim for a key that IS present must fail: claiming
    value 0x0 for alice's populated slot 0x1 is a lie the absence path
    must not accept."""
    pdf = wire_df.copy(deep=True)
    row = pdf.index[pdf["storage_values"].map(len) == 3][0]  # alice
    vals = list(pdf.at[row, "storage_values"])
    vals[0] = "0x"  # claim zero for the populated slot
    pdf.at[row, "storage_values"] = vals
    out = pd.concat(_verify_batches(iter([pdf])), ignore_index=True)
    assert not out["valid"].all()
