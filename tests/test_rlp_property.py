"""Property-based tests (hypothesis) for the RLP codec and the trie
builder — the spec-exactness the fixed vectors in tests/test_mpt.py pin
is here exercised over arbitrary inputs: encode∘decode is the identity
on all canonical structures, and build_trie → decode_node → walk
recovers exactly the entries that went in, for ANY entry map."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from euclid_spark.functions.keccak import keccak256
from euclid_spark.functions.rlp import (
    build_trie,
    decode_node,
    hp_decode,
    hp_encode,
    rlp_decode,
    rlp_encode,
)

# arbitrary nested RLP structures: bytes leaves, lists of depth ≤ 4
rlp_items = st.recursive(
    st.binary(min_size=0, max_size=80),
    lambda children: st.lists(children, max_size=6),
    max_leaves=30,
)


@settings(max_examples=300, deadline=None)
@given(rlp_items)
def test_rlp_round_trip(item):
    assert rlp_decode(rlp_encode(item)) == item


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 15), max_size=65), st.booleans())
def test_hex_prefix_round_trip(nibbles, is_leaf):
    got_nibbles, got_leaf = hp_decode(hp_encode(nibbles, is_leaf))
    assert got_nibbles == nibbles and got_leaf == is_leaf


def _walk(nodes: "dict[bytes, bytes]", ref, prefix: "list[int]", out: dict):
    """Pure-python trie walk: resolve ref (hash or embedded), collect
    (key_nibbles, value) — an independent implementation of the Spark
    walker's semantics used as the property oracle."""
    if isinstance(ref, (bytes, bytearray)) and len(ref) == 32:
        rec = decode_node(nodes[bytes(ref)])
    else:  # embedded (<32 B) node: raw structure
        rec = decode_node(rlp_encode(ref))
    if rec["type"] == "leaf":
        out[tuple(prefix + rec["path"])] = rec["value"]
        return
    if rec["type"] == "extension":
        _walk(nodes, rec["children"][0][1], prefix + rec["path"], out)
        return
    if rec["value"]:
        out[tuple(prefix)] = rec["value"]
    for idx, child in rec["children"]:
        _walk(nodes, child, prefix + [idx], out)


def _nibbles(b: bytes) -> "tuple[int, ...]":
    out = []
    for x in b:
        out += [x >> 4, x & 0xF]
    return tuple(out)


# entry maps: 1-30 entries, keys 1-8 bytes (unique), values 1-40 bytes.
# NOTE: one key being a strict prefix of another is not representable in
# an MPT keyed by nibbles unless the branch-value slot is used — the
# builder supports that (branch terminals), so prefix keys are allowed.
entry_maps = st.dictionaries(
    st.binary(min_size=1, max_size=8),
    st.binary(min_size=1, max_size=40),
    min_size=1,
    max_size=30,
)


@settings(max_examples=150, deadline=None)
@given(entry_maps)
def test_trie_round_trip_arbitrary_entries(entries):
    root, nodes = build_trie(entries)
    # root integrity: every stored node is content-addressed
    for h, enc in nodes.items():
        assert keccak256(enc) == h
    got: dict = {}
    _walk(nodes, root, [], got)
    exp = {_nibbles(k): v for k, v in entries.items()}
    assert got == exp
