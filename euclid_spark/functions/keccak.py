"""Keccak-256 (the Ethereum hash) — public FIPS-202/Keccak algorithm.

The reference derives every storage location and MPT key with
keccak-256 (mrp2-utils/src/storage_key.rs, consumed by
mr-plonky2-circuits/src/storage/key.rs). No keccak library ships in
this environment, so the permutation is implemented here from the
public Keccak specification (Bertoni, Daemen, Peeters, Van Assche;
FIPS 202 with the ORIGINAL 0x01 multi-rate padding — NOT SHA-3's 0x06
domain byte, which yields different digests).

Two implementations, cross-checked in tests:
- `keccak256` — plain-Python sponge, any input length (the readable
  reference; also the fallback for inputs spanning >1 rate block);
- `_keccak_f_numpy` + `keccak256_batch` — the whole 24-round
  permutation vectorized with numpy uint64 across a batch of inputs.
  Storage-key derivation hashes fixed 64-byte tuples (< the 136-byte
  rate ⇒ exactly one block), so an Arrow batch of n rows costs one
  vectorized permutation pass, not n Python sponge runs.

This is the COLD path by design: key derivation is a one-time indexing
step (the extraction phase), not a per-query expression. The
oracle-checked queries keep the sha2 stand-in (functions/mpt.py);
`euclid_mapping_extract_keccak` is the bit-exact Ethereum variant,
rows-only at the driver (DuckDB has no keccak).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_RATE = 136  # 1088-bit rate for capacity 512 → keccak-256

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y] (lane (x, y), lane index = x + 5y)
_R = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rol(v: int, s: int) -> int:
    return ((v << s) | (v >> (64 - s))) & _M64 if s else v


def _keccak_f(a: list[list[int]]) -> list[list[int]]:
    """One keccak-f[1600] permutation on a 5×5 lane matrix (ints)."""
    for rnd in range(24):
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        a = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _R[x][y])
        a = [
            [b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & _M64) for y in range(5)]
            for x in range(5)
        ]
        a[0][0] ^= _RC[rnd]
    return a


def _pad(data: bytes) -> bytes:
    """Original keccak multi-rate padding: 0x01 … 0x80 (0x81 if one byte)."""
    q = _RATE - (len(data) % _RATE)
    if q == 1:
        return data + b"\x81"
    return data + b"\x01" + b"\x00" * (q - 2) + b"\x80"


def keccak256(data: bytes) -> bytes:
    """Reference sponge: keccak-256 digest of arbitrary-length bytes."""
    a = [[0] * 5 for _ in range(5)]
    padded = _pad(data)
    for off in range(0, len(padded), _RATE):
        block = padded[off : off + _RATE]
        for i in range(_RATE // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            a[i % 5][i // 5] ^= lane
        a = _keccak_f(a)
    out = b"".join(
        a[i % 5][i // 5].to_bytes(8, "little") for i in range(4)  # 32 bytes
    )
    return out


def _keccak_f_numpy(lanes: np.ndarray) -> np.ndarray:
    """Vectorized keccak-f[1600]: `lanes` has shape (25, n) uint64 (lane
    index i = x + 5y), permuting n states at once. numpy uint64 ops wrap
    mod 2⁶⁴, exactly the lane arithmetic."""
    a = lanes  # view: a[x + 5*y]
    idx = lambda x, y: x + 5 * y  # noqa: E731
    rc = np.array(_RC, dtype=np.uint64)
    one = np.uint64(1)
    s63 = np.uint64(63)
    for rnd in range(24):
        c = [a[idx(x, 0)] ^ a[idx(x, 1)] ^ a[idx(x, 2)] ^ a[idx(x, 3)] ^ a[idx(x, 4)] for x in range(5)]
        d = [
            c[(x - 1) % 5] ^ ((c[(x + 1) % 5] << one) | (c[(x + 1) % 5] >> s63))
            for x in range(5)
        ]
        for x in range(5):
            for y in range(5):
                a[idx(x, y)] ^= d[x]
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                s = _R[x][y]
                v = a[idx(x, y)]
                if s:
                    v = (v << np.uint64(s)) | (v >> np.uint64(64 - s))
                else:
                    # copy: chi writes a's rows in place; an aliased view
                    # would be corrupted before its readers consume it
                    v = v.copy()
                b[idx(y, (2 * x + 3 * y) % 5)] = v
        for x in range(5):
            for y in range(5):
                a[idx(x, y)] = b[idx(x, y)] ^ (~b[idx((x + 1) % 5, y)] & b[idx((x + 2) % 5, y)])
        a[0] ^= rc[rnd]
    return a


def keccak256_batch(items: "list[bytes] | np.ndarray") -> list[bytes]:
    """Digest a batch with the vectorized permutation, ANY input lengths.

    Inputs are bucketed by padded block count; each bucket absorbs its
    blocks in lockstep (one `_keccak_f_numpy` pass per block index), so
    a batch of n items of ≤ b blocks costs ≤ b vectorized passes — not n
    Python sponge runs. Storage-key tuples are 1 block; MPT branch nodes
    run 2-5 blocks; both hit the same path."""
    out: "list[bytes | None]" = [None] * len(items)
    by_blocks: "dict[int, list[int]]" = {}
    padded: "list[bytes]" = []
    for i, it in enumerate(items):
        p = _pad(bytes(it))
        padded.append(p)
        by_blocks.setdefault(len(p) // _RATE, []).append(i)
    for nb, idxs in by_blocks.items():
        n = len(idxs)
        blocks = np.zeros((n, nb * _RATE), dtype=np.uint8)
        for row, i in enumerate(idxs):
            blocks[row] = np.frombuffer(padded[i], dtype=np.uint8)
        lanes = blocks.view("<u8")  # (n, nb * 17) lanes, row-major
        state = np.zeros((25, n), dtype=np.uint64)
        for b in range(nb):
            state[: _RATE // 8] ^= lanes[:, b * 17 : (b + 1) * 17].T
            state = _keccak_f_numpy(state)
        digests = state[:4].T.astype("<u8").tobytes()  # row-major 32B each
        for row, i in enumerate(idxs):
            out[i] = digests[32 * row : 32 * row + 32]
    return out  # type: ignore[return-value]
