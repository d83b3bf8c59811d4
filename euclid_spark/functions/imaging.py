"""Stdlib-only image codecs for the multimodal pipeline (VERDICT r4 #6).

The container ships no media libraries (PIL/ffmpeg), so C11's decode
path was a documented stub. Two formats need NO codec — their specs are
pure header + raw pixels — and give the pipeline a REAL decode path:

- BMP (Windows bitmap, uncompressed 24-bit BI_RGB): 14-byte file
  header + 40-byte BITMAPINFOHEADER, rows bottom-up, BGR order, each
  row padded to a 4-byte boundary (public spec: Windows BITMAPFILEHEADER
  / BITMAPINFOHEADER layout).
- PPM "P6" (Netpbm portable pixmap): ASCII header `P6 <w> <h> <maxval>`
  with #-comments, then raw RGB bytes (public Netpbm spec).

`decode_image` sniffs the magic and returns an (h, w, 3) uint8 RGB
array; `encode_bmp` / `encode_ppm` are the exact inverses, used to
generate deterministic fixture bytes in tests (round-trip is bit-exact
for both). Everything is numpy slicing — decoding a 24-bit BMP is one
reshape + stride-drop + vertical flip, no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BI_RGB BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3, "RGB input required"
    row_size = (3 * w + 3) & ~3  # rows pad to 4-byte boundary
    img_size = row_size * h
    # pixel data: bottom-up rows, BGR order, padded
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_size = (3 * w + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=offset
    ).reshape(h, row_size)
    img = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6) bytes."""
    h, w, c = pixels.shape
    assert c == 3, "RGB input required"
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens after the magic,
    skipping #-comments; return (values, offset past the single
    whitespace byte that terminates the last token)."""
    vals: list[int] = []
    i = 2  # past "P6"
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly ONE whitespace after maxval, per spec


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if maxval != 255:
        raise NotImplementedError(f"only 8-bit PPM supported (maxval={maxval})")
    return np.frombuffer(payload, dtype=np.uint8, count=3 * w * h, offset=off).reshape(
        h, w, 3
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffing decode: BMP or PPM → (h, w, 3) uint8 RGB. Other
    formats genuinely need codecs this container does not have."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "only BMP/PPM decode without media codecs; install PIL/ffmpeg for more"
    )
