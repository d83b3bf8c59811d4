"""RLP / MPT ingestion (SURVEY §2.A15-A16).

Layered: (1) RLP codec against the public specification vectors, (2) trie
builder against the canonical public test-vector roots (empty trie,
the do/dog/doge/horse fixture), (3) pure-Python shred→decode→reassemble
round trip, (4) the distributed Spark pipeline end-to-end — synthesize
per-owner tries, decode nodes, walk, and recover exactly the entries.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from euclid_spark.functions.rlp import (
    EMPTY_ROOT,
    build_trie,
    decode_node,
    from_nibbles,
    hp_decode,
    hp_encode,
    rlp_decode,
    rlp_encode,
    to_nibbles,
)

# public RLP spec examples
RLP_VECTORS = [
    (b"dog", "83646f67"),
    ([b"cat", b"dog"], "c88363617483646f67"),
    (b"", "80"),
    ([], "c0"),
    (b"\x00", "00"),
    (b"\x0f", "0f"),
    (b"\x04\x00", "820400"),
    ([[], [[]], [[], [[]]]], "c7c0c1c0c3c0c1c0"),
    (b"Lorem ipsum dolor sit amet, consectetur adipisicing elit",
     "b8384c6f72656d20697073756d20646f6c6f722073697420616d65742c20636f6e7365637465747572206164697069736963696e6720656c6974"),
]


@pytest.mark.parametrize("item,hexenc", RLP_VECTORS)
def test_rlp_spec_vectors(item, hexenc):
    assert rlp_encode(item).hex() == hexenc
    assert rlp_decode(bytes.fromhex(hexenc)) == item


def test_rlp_roundtrip_random():
    rng = random.Random(11)

    def rand_item(depth=0):
        if depth > 3 or rng.random() < 0.6:
            return bytes(rng.randrange(256) for _ in range(rng.randrange(80)))
        return [rand_item(depth + 1) for _ in range(rng.randrange(5))]

    for _ in range(200):
        it = rand_item()
        assert rlp_decode(rlp_encode(it)) == it


def test_hp_roundtrip():
    rng = random.Random(3)
    for _ in range(100):
        nib = [rng.randrange(16) for _ in range(rng.randrange(12))]
        for leaf in (True, False):
            assert hp_decode(hp_encode(nib, leaf)) == (nib, leaf)


def test_trie_known_roots():
    """Canonical public fixtures: the empty-trie root and the
    do/dog/doge/horse trie from the shared Ethereum trie test suite."""
    assert (
        EMPTY_ROOT.hex()
        == "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421"
    )
    root, _ = build_trie(
        {b"do": b"verb", b"dog": b"puppy", b"doge": b"coin", b"horse": b"stallion"}
    )
    assert (
        root.hex()
        == "5991bb8c6514148a29db676a14ac506cd2cd5775ace63c30a4fe457715e9ac84"
    )


def _walk_python(root, nodes):
    """Driver-side reference walker over decode_node records."""
    out = {}

    def go(ref, prefix):
        if isinstance(ref, bytes) and len(ref) == 32:
            rec = decode_node(nodes[ref])
        else:  # embedded
            rec = decode_node(rlp_encode(ref))
        if rec["type"] == "leaf":
            out[from_nibbles(prefix + rec["path"])] = rec["value"]
            return
        if rec["type"] == "branch" and rec["value"]:
            out[from_nibbles(prefix)] = rec["value"]
        for idx, child in rec["children"]:
            go(child, prefix + rec["path"] + ([idx] if idx >= 0 else []))

    go(root, [])
    return out


def test_python_roundtrip_random_entries():
    rng = random.Random(5)
    entries = {
        rng.randrange(2**32).to_bytes(4, "big"): bytes(
            rng.randrange(256) for _ in range(32)
        )
        for _ in range(300)
    }
    root, nodes = build_trie(entries)
    assert _walk_python(root, nodes) == entries


def test_python_roundtrip_short_values_embedded_nodes():
    """1-byte values make leaves < 32 bytes RLP → embedded children; the
    walker must traverse inline structures too."""
    entries = {bytes([i]): bytes([i ^ 0xFF]) for i in range(40)}
    root, nodes = build_trie(entries)
    assert _walk_python(root, nodes) == entries


def test_nibble_helpers():
    assert to_nibbles(b"\xab\x04") == [10, 11, 0, 4]
    assert from_nibbles([10, 11, 0, 4]) == b"\xab\x04"


# ------------------------------------------------------ Spark pipeline ---


def test_spark_decode_promotes_embedded(spark):
    """Embedded (<32-byte RLP) children appear as first-class decoded
    rows keyed by their keccak, so the walker never sees an inline ref."""
    from euclid_spark.operators.mpt_ingest import decode_mpt_nodes, mpt_reassemble

    entries = {bytes([i]): bytes([i + 1]) for i in range(20)}
    root, nodes = build_trie(entries)
    rows = [(1, h.hex(), nodes[h], h == root) for h in nodes]
    ndf = spark.createDataFrame(
        rows, "owner long, node_hash string, node_rlp binary, is_root boolean"
    )
    dec = decode_mpt_nodes(ndf)
    got = mpt_reassemble(dec, ndf.filter("is_root").select("owner", "node_hash"))
    recovered = {
        from_nibbles(r["key_nibbles"]): bytes(r["value"]) for r in got.collect()
    }
    assert recovered == entries


def test_spark_full_roundtrip_matches_entries(spark):
    """A16 end-to-end at the smoke SF: the recovered (owner, token_id,
    value_hex) set equals the entry derivation it was built from."""
    from euclid_spark.operators.mpt_ingest import mpt_reassemble_query
    from euclid_spark.operators.euclid import _range, _token_id
    from tests.conftest import SF_SMOKE

    got = {
        (r["owner"], r["token_id"], r["value_hex"])
        for r in mpt_reassemble_query(spark, SF_SMOKE).collect()
    }
    expect = {
        (
            r["owner"],
            r["token_id"],
            f"{(r['owner'] << 32) + r['token_id']:064x}",
        )
        for r in (
            _range(spark, SF_SMOKE)
            .filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("owner"), _token_id().alias("token_id"))
            .filter(F.col("token_id").isNotNull())
            .distinct()
        ).collect()
    }
    assert got == expect and len(got) > 50
