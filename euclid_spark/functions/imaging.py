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
    """Magic-sniffing decode: BMP, PPM, or PNG (r8 — zlib is stdlib, so
    the most common web image format decodes for real too) →
    (h, w, 3) uint8 RGB. Other formats genuinely need codecs this
    container does not have."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"\x89PNG":
        return decode_png(payload)
    raise NotImplementedError(
        "only BMP/PPM/PNG decode without media codecs; "
        "install PIL/ffmpeg for more"
    )


# --- PNG (zlib-deflate + per-row filters — stdlib only) -----------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized (spec §9.4): pick the neighbor
    (left a, up b, upper-left c) closest to a + b − c."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (8-bit truecolor, colortype 2,
    no interlace). `filter_type` applies ONE filter (0..4) to every
    scanline — used by tests to exercise each unfilter path; production
    encoders pick per-row, the decoder does not care."""
    import zlib

    h, w, c = pixels.shape
    assert c == 3, "RGB input required"
    if filter_type not in range(5):
        raise ValueError(f"PNG filter type must be 0..4, got {filter_type}")
    rows = pixels.reshape(h, 3 * w).astype(np.uint8)
    prev = np.zeros(3 * w, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        raw = rows[y]
        left = np.concatenate([np.zeros(3, np.uint8), raw[:-3]])
        ul = np.concatenate([np.zeros(3, np.uint8), prev[:-3]])
        if filter_type == 0:
            filt = raw
        elif filter_type == 1:  # Sub
            filt = raw - left
        elif filter_type == 2:  # Up
            filt = raw - prev
        elif filter_type == 3:  # Average
            filt = raw - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
            ).astype(np.uint8)
        else:  # Paeth
            filt = raw - _paeth(left, prev, ul)
        out.append(filter_type)
        out.extend(filt.tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB. Supports the format this
    pipeline stores (8-bit truecolor, colortype 2, non-interlaced) with
    ALL FIVE scanline filters (spec §9): None/Up vectorized whole-row;
    Sub is a per-pixel-stride cumulative sum; Average/Paeth recur on the
    reconstructed left neighbor, so they walk pixels within the row
    (numpy per-row state, h·w bounded — fixture/thumbnail scale; a
    production decoder would be a codec library, which this container
    does not ship). CRCs are verified per chunk."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = None
    idat = bytearray()
    saw_iend = False
    while pos < len(payload):
        # bounds-check against the DECLARED length before slicing: a
        # truncated or corrupt length field must raise the ValueError the
        # quarantine contract expects, not a struct.error from the crc
        # unpack past the end of the buffer
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, ctype_, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype_, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG supported "
                    f"(depth={depth}, colortype={ctype_}, "
                    f"interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            saw_iend = True
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if not saw_iend:
        raise ValueError("PNG missing IEND chunk")
    raw = zlib.decompress(bytes(idat))
    stride = 3 * w
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(lines[y, 0])
        cur = lines[y, 1:].copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: cumulative along the 3-byte stride
            cur = np.cumsum(
                cur.reshape(w, 3).astype(np.uint16), axis=0, dtype=np.uint16
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            cur = cur + prev
        elif ftype == 3:  # Average
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(0, stride, 3):
                left = rec[x - 3 : x] if x else np.zeros(3, np.uint8)
                avg = (
                    left.astype(np.uint16) + prev[x : x + 3].astype(np.uint16)
                ) // 2
                rec[x : x + 3] = cur[x : x + 3] + avg.astype(np.uint8)
            cur = rec
        elif ftype == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(0, stride, 3):
                left = rec[x - 3 : x] if x else np.zeros(3, np.uint8)
                ul = prev[x - 3 : x] if x else np.zeros(3, np.uint8)
                rec[x : x + 3] = cur[x : x + 3] + _paeth(
                    left, prev[x : x + 3], ul
                )
            cur = rec
        else:
            raise ValueError(f"PNG filter type {ftype} is not in the spec")
        recon[y] = cur
        prev = recon[y]
    return recon.reshape(h, w, 3)
