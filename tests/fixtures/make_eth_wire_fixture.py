"""Generate the recorded eth_getProof wire-JSON fixture
(`eth_getproof_recorded.json`) — byte-for-byte the shape the public
JSON-RPC API returns (mrp2-test-utils/src/eth.rs is the reference's own
recorded-fixture pattern; this sandbox has no network, so the recording
is synthesized once with the engine's own spec-exact trie kernels and
committed).

Deliberate wire quirks exercised:
  - EIP-55 mixed-case (checksummed) addresses,
  - QUANTITY hex everywhere geth uses it: "0x0" for zero, minimal
    odd-length digits ("0x1b3"), never left-padded,
  - storage keys echoed exactly as requested — UNPADDED ("0x1"),
  - an account with NO storage (storageHash = the empty-trie root,
    an exclusion storageProof with an empty node list),
  - an EXCLUSION proof on a populated trie (absent key, value "0x0",
    node list walking to the divergence point),
  - full JSON-RPC envelopes ({"jsonrpc","id","result"}) plus the
    eth_getBlockByNumber header that supplies the state root.

Run: python tests/fixtures/make_eth_wire_fixture.py  (deterministic;
rewrites the JSON in place).
"""

from __future__ import annotations

import json
import os

from euclid_spark.functions.keccak import keccak256
from euclid_spark.functions.rlp import build_trie, rlp_encode, to_nibbles
from euclid_spark.sources.eth_proof import CODE_HASH, _int_be, extract_proof

OUT = os.path.join(os.path.dirname(__file__), "eth_getproof_recorded.json")


def eip55(addr: bytes) -> str:
    """EIP-55 checksum casing (public spec: uppercase hex digit i iff
    nibble i of keccak(lowercase-hex-address) >= 8)."""
    low = addr.hex()
    h = keccak256(low.encode()).hex()
    return "0x" + "".join(
        c.upper() if c.isalpha() and int(h[i], 16) >= 8 else c
        for i, c in enumerate(low)
    )


def q(n: int) -> str:
    """QUANTITY encoding: minimal hex, '0x0' for zero."""
    return hex(n)


def data(b: bytes) -> str:
    return "0x" + b.hex()


def storage_trie(slots: "dict[int, int]"):
    """Secure storage trie over {slot_key_int: value_int} (paths =
    keccak(key32), values = minimal-RLP integers)."""
    return build_trie(
        {
            keccak256(k.to_bytes(32, "big")): rlp_encode(_int_be(v))
            for k, v in slots.items()
        }
    )


def storage_proof_entry(key: int, value: int, root, nodes) -> dict:
    from euclid_spark.functions.rlp import EMPTY_ROOT

    path = to_nibbles(keccak256(key.to_bytes(32, "big")))
    # geth returns an EMPTY node list against the empty-trie root
    proof = [] if root == EMPTY_ROOT else extract_proof(root, path, nodes)
    return {"key": q(key), "value": q(value), "proof": [data(p) for p in proof]}


def main() -> None:
    accounts = [
        # (address bytes, nonce, balance, {slot: value}, extra absent keys)
        (keccak256(b"wire:alice")[-20:], 2, 0x29A2241AF62C0000,
         {1: 0x64, 0x2CAFE: 0x1}, [0xDEAD]),
        (keccak256(b"wire:bob")[-20:], 0, 0, {}, [0]),
        (keccak256(b"wire:carol")[-20:], 0, 0x1B3, {7: 0x2540BE400}, []),
    ]

    tries = {a[0]: storage_trie(a[3]) for a in accounts}
    state_entries = {}
    for addr, nonce, balance, _, _ in accounts:
        sroot = tries[addr][0]
        state_entries[keccak256(addr)] = rlp_encode(
            [_int_be(nonce), _int_be(balance), sroot, CODE_HASH]
        )
    state_root, state_nodes = build_trie(state_entries)

    proofs = []
    for i, (addr, nonce, balance, slots, absent) in enumerate(accounts):
        sroot, snodes = tries[addr]
        sp = [
            storage_proof_entry(k, v, sroot, snodes)
            for k, v in sorted(slots.items())
        ]
        # geth answers absent/zero slots with value 0x0 + exclusion proof
        sp += [storage_proof_entry(k, 0, sroot, snodes) for k in absent]
        proofs.append(
            {
                "jsonrpc": "2.0",
                "id": i + 2,
                "result": {
                    "address": eip55(addr),
                    "accountProof": [
                        data(p)
                        for p in extract_proof(
                            state_root, to_nibbles(keccak256(addr)), state_nodes
                        )
                    ],
                    "balance": q(balance),
                    "codeHash": data(CODE_HASH),
                    "nonce": q(nonce),
                    "storageHash": data(sroot),
                    "storageProof": sp,
                },
            }
        )

    doc = {
        "block": {
            # the eth_getBlockByNumber call that supplies the state root
            "number": q(0x152A9B2),
            "hash": data(keccak256(b"wire:blockhash")),
            "parentHash": data(keccak256(b"wire:parent")),
            "stateRoot": data(state_root),
            "timestamp": q(0x66C5F2A1),
        },
        "proofs": proofs,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
