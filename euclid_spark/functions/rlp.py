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


class _Node:
    """Structural trie node, hashed later in level batches."""

    __slots__ = ("kind", "path", "value", "kids", "height", "ref", "item")

    def __init__(self, kind, path=(), value=b"", kids=()):
        self.kind = kind  # leaf | ext | branch
        self.path = list(path)
        self.value = value
        self.kids = list(kids)  # [(digit_or_-1, _Node)]
        self.height = 0
        self.ref = None  # 32-byte hash OR embedded structure
        self.item = None


def _build(items: "list[tuple[list[int], bytes]]") -> _Node:
    """Canonical radix construction over (remaining-nibbles, value) —
    structure only; hashing happens afterwards, level-batched."""
    if len(items) == 1 and items[0][0]:
        nib, v = items[0]
        return _Node("leaf", nib, v)
    first = items[0][0]
    plen = 0
    while (
        plen < len(first)
        and all(len(nib) > plen and nib[plen] == first[plen] for nib, _ in items)
    ):
        plen += 1
    if plen:
        child = _build([(nib[plen:], v) for nib, v in items])
        return _Node("ext", first[:plen], kids=[(-1, child)])
    slots_val = b""
    by_nib: "dict[int, list]" = {}
    for nib, v in items:
        if not nib:
            slots_val = v
        else:
            by_nib.setdefault(nib[0], []).append((nib[1:], v))
    kids = [(d, _build(g)) for d, g in sorted(by_nib.items())]
    return _Node("branch", value=slots_val, kids=kids)


def _node_item(n: _Node) -> "bytes | list":
    """Structural RLP item with children replaced by their refs (which
    must already be resolved — process heights bottom-up)."""
    if n.kind == "leaf":
        return [hp_encode(n.path, True), n.value]
    if n.kind == "ext":
        return [hp_encode(n.path, False), n.kids[0][1].ref]
    slots: "list[bytes | list]" = [b""] * 17
    slots[16] = n.value
    for d, kid in n.kids:
        slots[d] = kid.ref
    return slots


def build_tries_batch(
    entry_dicts: "list[dict[bytes, bytes]]",
) -> "list[tuple[bytes, dict[bytes, bytes]]]":
    """Build MANY canonical MPTs at once, hashing level-batched ACROSS
    tries: children's refs are strictly sequential with their parents',
    but all nodes at one height — in every trie — are independent, so
    each height is ONE `keccak256_batch` call. The vectorized keccak-f
    pass has ~4 ms fixed Python overhead regardless of batch width, so
    batching across tries (a Spark partition's worth of owners) is what
    actually amortizes it: d heights → d numpy passes TOTAL, not
    per-trie. The <32-byte embed rule is the real Ethereum one; the
    root is always stored by hash (as state/storage roots are)."""
    from euclid_spark.functions.keccak import keccak256_batch

    roots: "list[_Node | None]" = []
    out_nodes: "list[dict[bytes, bytes]]" = []
    levels: "dict[int, list[tuple[int, _Node]]]" = {}

    def set_height(ti: int, n: _Node) -> int:
        n.height = 1 + max((set_height(ti, k) for _, k in n.kids), default=-1)
        levels.setdefault(n.height, []).append((ti, n))
        return n.height

    for ti, entries in enumerate(entry_dicts):
        out_nodes.append({})
        if not entries:
            roots.append(None)
            out_nodes[ti][EMPTY_ROOT] = rlp_encode(b"")
            continue
        root = _build(sorted((to_nibbles(k), v) for k, v in entries.items()))
        roots.append(root)
        set_height(ti, root)

    for h in sorted(levels):
        encs, hashed = [], []
        for ti, n in levels[h]:
            n.item = _node_item(n)
            enc = rlp_encode(n.item)
            if len(enc) < 32 and n is not roots[ti]:
                n.ref = n.item  # embedded in the parent
            else:
                encs.append(enc)
                hashed.append((ti, n))
        for (ti, n), enc, dig in zip(hashed, encs, keccak256_batch(encs)):
            n.ref = dig
            out_nodes[ti][dig] = enc
    return [
        (EMPTY_ROOT if r is None else r.ref, nd)  # type: ignore[misc]
        for r, nd in zip(roots, out_nodes)
    ]


def build_trie(entries: "dict[bytes, bytes]") -> "tuple[bytes, dict[bytes, bytes]]":
    """Single-trie convenience wrapper over build_tries_batch."""
    return build_tries_batch([entries])[0]


def graft_subtries(
    groups: "list[tuple[list[int], bytes]]",
) -> "tuple[bytes, dict[tuple, tuple[list[bytes], bytes | None]]]":
    """Canonically merge PREFIX-PARTITIONED sub-tries into one MPT — the
    bounded driver-side fold of a distributed trie build: executors
    build one sub-trie per key prefix with build_tries_batch (over the
    keys with the prefix STRIPPED), the driver merges only the
    O(|prefixes|) roots, so driver work never grows with the entry
    count (the capture's state trie over 10⁸ accounts folds 256 roots).

    groups: (prefix_nibbles, sub_root_enc) per NON-EMPTY prefix;
    sub_root_enc is the sub-trie root node's encoding (build_tries_batch
    stores roots by hash). Every sub_root_enc must be ≥ 32 bytes — true
    whenever leaf values alone exceed 32 bytes (account bodies carry a
    32-byte storage root + 32-byte code hash); an embedded sub-root
    would have to be re-encoded into its parent, which this fold
    refuses rather than silently mis-hashing.

    Returns (root_ref, per_prefix) with per_prefix[tuple(prefix)] =
    (chain, replacement): `chain` is the hash-referenced node encodings
    ABOVE the sub-trie on that prefix's walk (root first), and
    `replacement` is a re-encoded sub-root — a leaf/extension whose
    hex-prefix path absorbed prefix nibbles no branch above consumed
    (the rule that keeps the graft canonical: _build never stacks an
    extension over another extension/leaf, it concatenates paths) — or
    None when the executor's encoding is reused byte-identical. A
    grafted proof is chain + (replacement or sub_proof[0]) +
    sub_proof[1:].

    Canonical equivalence with build_trie over the union key set
    (root bytes AND per-key proofs) is property-tested in
    tests/test_eth_proof.py."""
    if not groups:
        return EMPTY_ROOT, {}
    per_prefix: "dict[tuple, tuple[list[bytes], bytes | None]]" = {}

    def _hashed(enc: bytes, what: str) -> bytes:
        if len(enc) < 32:
            raise ValueError(f"graft_subtries: {what} would embed (<32 B)")
        return keccak256(enc)

    def build(items: "list[tuple[list[int], tuple, bytes]]") -> dict:
        """items: (remaining_prefix_nibbles, full_prefix, sub_root_enc).
        Returns {"ref", "enc"?, "kids"?, graft fields}."""
        if len(items) == 1:
            nibs, pref, enc = items[0]
            item = rlp_decode(enc)
            if nibs and isinstance(item, list) and len(item) == 2:
                # leaf/ext sub-root below unconsumed nibbles: absorb them
                # into its own hex-prefix path (canonical path merge)
                path, is_leaf = hp_decode(item[0])
                new_enc = rlp_encode(
                    [hp_encode(list(nibs) + list(path), is_leaf), item[1]]
                )
                return {
                    "ref": _hashed(new_enc, "re-pathed sub-root"),
                    "pref": pref, "extra": [], "repl": new_enc,
                }
            if nibs:  # branch sub-root: one extension above, reused below
                ext_enc = rlp_encode(
                    [hp_encode(list(nibs), False), _hashed(enc, "sub-root")]
                )
                return {
                    "ref": _hashed(ext_enc, "graft extension"),
                    "pref": pref, "extra": [ext_enc], "repl": None,
                }
            return {
                "ref": _hashed(enc, "sub-root"),
                "pref": pref, "extra": [], "repl": None,
            }
        first = items[0][0]
        plen = 0
        while plen < len(first) and all(
            len(n) > plen and n[plen] == first[plen] for n, _, _ in items
        ):
            plen += 1
        if plen:
            # >1 item shares this prefix, so after stripping it the first
            # nibbles differ: the child is always a branch (no ext-ext)
            child = build([(n[plen:], p, e) for n, p, e in items])
            enc = rlp_encode([hp_encode(first[:plen], False), child["ref"]])
            return {
                "ref": _hashed(enc, "top extension"),
                "enc": enc, "kids": [child],
            }
        by: "dict[int, list]" = {}
        for n, p, e in items:
            if not n:
                raise ValueError("graft_subtries: prefix is a strict "
                                 "prefix of another prefix")
            by.setdefault(n[0], []).append((n[1:], p, e))
        kids = [build(g) for _, g in sorted(by.items())]
        slots: "list[bytes | list]" = [b""] * 17
        for (d, _), k in zip(sorted(by.items()), kids):
            slots[d] = k["ref"]
        enc = rlp_encode(slots)
        return {"ref": _hashed(enc, "top branch"), "enc": enc, "kids": kids}

    root = build([(list(p), tuple(p), enc) for p, enc in groups])

    def walk(node: dict, chain: "list[bytes]") -> None:
        if "pref" in node:
            per_prefix[node["pref"]] = (chain + node["extra"], node["repl"])
            return
        below = chain + [node["enc"]]
        for kid in node["kids"]:
            walk(kid, below)

    walk(root, [])
    return root["ref"], per_prefix


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
