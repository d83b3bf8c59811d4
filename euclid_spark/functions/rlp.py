"""RLP + Merkle-Patricia-Trie primitives (public Ethereum specification).

The reference's extraction phase consumes raw trie nodes: RLP decoding
(`mrp2-utils/src/rlp.rs`) and leaf/extension/branch traversal
(`mrp2-utils/src/mpt_sequential/mod.rs`,
`mr-plonky2-circuits/src/storage/mapping/{leaf,branch,extension}.rs`).
Everything here is implemented from the public RLP spec / yellow-paper
appendices: RLP encode/decode, hex-prefix (compact) path encoding, and a
canonical trie builder used both to synthesize test tries and inside the
per-group Spark synthesis UDF. The Spark-side operators live in
operators/mpt_ingest.py; these are the plain-Python kernels they batch.
"""

from __future__ import annotations

from euclid_spark.functions.keccak import keccak256

# ---------------------------------------------------------------- RLP ---


def _len_prefix(n: int, offset: int) -> bytes:
    if n <= 55:
        return bytes([offset + n])
    nb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([offset + 55 + len(nb)]) + nb


def rlp_encode(item: "bytes | list") -> bytes:
    """RLP of a bytes string or a (nested) list of items."""
    if isinstance(item, (bytes, bytearray)):
        item = bytes(item)
        if len(item) == 1 and item[0] < 0x80:
            return item
        return _len_prefix(len(item), 0x80) + item
    payload = b"".join(rlp_encode(x) for x in item)
    return _len_prefix(len(payload), 0xC0) + payload


def _decode_at(data: bytes, pos: int) -> "tuple[bytes | list, int]":
    """Decode one item starting at pos; return (item, next_pos)."""
    if pos >= len(data):
        raise ValueError("rlp: truncated input")
    b0 = data[pos]
    if b0 < 0x80:  # single byte literal
        return data[pos : pos + 1], pos + 1
    if b0 <= 0xB7:  # short string
        n = b0 - 0x80
        end = pos + 1 + n
        if end > len(data):
            raise ValueError("rlp: truncated string")
        if n == 1 and data[pos + 1] < 0x80:
            raise ValueError("rlp: non-canonical single byte")
        return data[pos + 1 : end], end
    if b0 <= 0xBF:  # long string
        ln = b0 - 0xB7
        n = int.from_bytes(data[pos + 1 : pos + 1 + ln], "big")
        if n <= 55:
            raise ValueError("rlp: non-canonical long string")
        start = pos + 1 + ln
        end = start + n
        if end > len(data):
            raise ValueError("rlp: truncated string")
        return data[start:end], end
    if b0 <= 0xF7:  # short list
        n = b0 - 0xC0
        end = pos + 1 + n
        start = pos + 1
    else:  # long list
        ln = b0 - 0xF7
        n = int.from_bytes(data[pos + 1 : pos + 1 + ln], "big")
        if n <= 55:
            raise ValueError("rlp: non-canonical long list")
        start = pos + 1 + ln
        end = start + n
    if end > len(data):
        raise ValueError("rlp: truncated list")
    items = []
    p = start
    while p < end:
        it, p = _decode_at(data, p)
        items.append(it)
    if p != end:
        raise ValueError("rlp: list payload overrun")
    return items, end


def rlp_decode(data: bytes) -> "bytes | list":
    item, end = _decode_at(bytes(data), 0)
    if end != len(data):
        raise ValueError("rlp: trailing bytes")
    return item


# ------------------------------------------- hex-prefix (compact) path ---


def hp_encode(nibbles: "list[int]", is_leaf: bool) -> bytes:
    """Yellow-paper hex-prefix: flag nibble (bit0 = odd length, bit1 =
    leaf) packed with the path nibbles into bytes."""
    flag = 2 if is_leaf else 0
    if len(nibbles) % 2:
        nib = [flag | 1] + list(nibbles)
    else:
        nib = [flag, 0] + list(nibbles)
    return bytes((nib[i] << 4) | nib[i + 1] for i in range(0, len(nib), 2))


def hp_decode(data: bytes) -> "tuple[list[int], bool]":
    if not data:
        raise ValueError("hp: empty")
    nibs = []
    for b in data:
        nibs.append(b >> 4)
        nibs.append(b & 0xF)
    flag = nibs[0]
    is_leaf = bool(flag & 2)
    path = nibs[1:] if flag & 1 else nibs[2:]
    return path, is_leaf


def to_nibbles(key: bytes) -> "list[int]":
    out = []
    for b in key:
        out.append(b >> 4)
        out.append(b & 0xF)
    return out


def from_nibbles(nibbles: "list[int]") -> bytes:
    if len(nibbles) % 2:
        raise ValueError("odd nibble count does not pack to bytes")
    return bytes(
        (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, len(nibbles), 2)
    )


# ------------------------------------------------------- trie builder ---

EMPTY_ROOT = keccak256(rlp_encode(b""))  # 56e81f17... (well-known)


def _node_ref(node: "bytes | list", nodes: "dict[bytes, bytes]"):
    """Ethereum reference rule: a node whose RLP is < 32 bytes is embedded
    in its parent as the raw structure; otherwise it is stored and
    referenced by its keccak hash."""
    enc = rlp_encode(node)
    if len(enc) < 32:
        return node
    h = keccak256(enc)
    nodes[h] = enc
    return h


def _build(items: "list[tuple[list[int], bytes]]", nodes) -> "bytes | list":
    """Canonical radix construction over (remaining-nibbles, value)."""
    if len(items) == 1 and items[0][0]:
        nib, v = items[0]
        return [hp_encode(nib, True), v]
    # longest shared prefix across all keys
    first = items[0][0]
    plen = 0
    while (
        plen < len(first)
        and all(len(nib) > plen and nib[plen] == first[plen] for nib, _ in items)
    ):
        plen += 1
    if plen:
        child = _build([(nib[plen:], v) for nib, v in items], nodes)
        return [hp_encode(first[:plen], False), _node_ref(child, nodes)]
    # branch: split on first nibble; an exhausted key terminates here
    slots: "list[bytes | list]" = [b""] * 17
    by_nib: "dict[int, list]" = {}
    for nib, v in items:
        if not nib:
            slots[16] = v
        else:
            by_nib.setdefault(nib[0], []).append((nib[1:], v))
    for d, group in by_nib.items():
        slots[d] = _node_ref(_build(group, nodes), nodes)
    return slots


def build_trie(entries: "dict[bytes, bytes]") -> "tuple[bytes, dict[bytes, bytes]]":
    """Build the canonical MPT for `entries` (key bytes → value bytes).
    Returns (root_hash, {node_hash: node_rlp}). The root is always stored
    by hash (as Ethereum state/storage roots are)."""
    if not entries:
        return EMPTY_ROOT, {EMPTY_ROOT: rlp_encode(b"")}
    nodes: "dict[bytes, bytes]" = {}
    items = sorted((to_nibbles(k), v) for k, v in entries.items())
    root = _build(items, nodes)
    enc = rlp_encode(root)
    h = keccak256(enc)
    nodes[h] = enc
    return h, nodes


def decode_node(node_rlp: bytes) -> dict:
    """Decode one trie node into a typed record.

    Returns {type: leaf|extension|branch, path: [nibbles] (leaf/ext),
    value: bytes (leaf value or branch slot 16), children: [(idx, ref)]}
    where ref is a 32-byte hash OR an embedded raw structure (list);
    idx is the branch nibble (0-15) or -1 for an extension child."""
    item = rlp_decode(node_rlp)
    if not isinstance(item, list):
        raise ValueError("mpt: node is not a list")
    if len(item) == 17:
        children = [
            (i, item[i]) for i in range(16) if item[i] != b""
        ]
        return {
            "type": "branch",
            "path": [],
            "value": item[16] if isinstance(item[16], bytes) else b"",
            "children": children,
        }
    if len(item) == 2:
        path, is_leaf = hp_decode(item[0])
        if is_leaf:
            return {"type": "leaf", "path": path, "value": item[1], "children": []}
        return {
            "type": "extension",
            "path": path,
            "value": b"",
            "children": [(-1, item[1])],
        }
    raise ValueError(f"mpt: {len(item)}-item node")
