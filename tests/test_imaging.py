"""Stdlib BMP/PPM codecs (VERDICT r4 #6) and the real decode path of the
mm_binary_pipeline: round-trips are bit-exact, a known-answer vector
pins the byte layout, and the Spark pipeline's features over image
payloads equal a numpy oracle computed from the fixture pixels."""

from __future__ import annotations

import numpy as np
import pytest

from euclid_spark.functions.imaging import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)


def _pixels(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (7, 5), (16, 16), (3, 33)])
def test_bmp_round_trip(h, w):
    px = _pixels(h * 100 + w, h, w)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (7, 5), (16, 16), (3, 33)])
def test_ppm_round_trip(h, w):
    px = _pixels(h * 100 + w, h, w)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_bmp_known_answer():
    """Pin the exact byte layout: 2x1 image, pixels (R=1,G=2,B=3) and
    (R=4,G=5,B=6). BMP stores bottom-up BGR with 4-byte row padding."""
    px = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)  # h=1, w=2
    raw = encode_bmp(px)
    assert raw[:2] == b"BM"
    assert raw[54:60] == bytes([3, 2, 1, 6, 5, 4])  # BGR, single row
    assert raw[60:62] == b"\x00\x00"  # pad 6 → 8 bytes
    assert len(raw) == 54 + 8


def test_ppm_header_with_comment():
    px = _pixels(9, 2, 2)
    raw = b"P6\n# a comment line\n2 2\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(raw), px)


def test_decode_image_sniffs_magic_and_rejects_unknown():
    px = _pixels(3, 4, 4)
    assert np.array_equal(decode_image(encode_bmp(px)), px)
    assert np.array_equal(decode_image(encode_ppm(px)), px)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF....")  # JPEG needs a codec
    from euclid_spark.functions.imaging import encode_png

    assert np.array_equal(decode_image(encode_png(px)), px)  # r8: PNG real


def test_pipeline_decodes_real_image_bytes(spark):
    """The C11 pipeline over an image-modality fixture set: features
    must be computed from the DECODED pixel buffers (numpy oracle),
    not the encoded file bytes."""
    from euclid_spark.operators.multimodal import FEATURE_SCHEMA, _feature_batches

    from euclid_spark.functions.imaging import encode_png

    fixtures = {
        1: ("image/bmp", _pixels(1, 8, 8)),
        2: ("image/bmp", _pixels(2, 5, 9)),
        3: ("image/x-portable-pixmap", _pixels(3, 6, 4)),
        4: ("image/x-portable-pixmap", _pixels(4, 1, 1)),
        6: ("image/png", _pixels(6, 7, 6)),  # r8: PNG decodes for real
    }
    enc = {
        "image/bmp": encode_bmp,
        "image/x-portable-pixmap": encode_ppm,
        "image/png": encode_png,
    }
    rows = []
    for doc_id, (modality, px) in fixtures.items():
        raw = enc[modality](px)
        rows.append((doc_id, modality, bytearray(raw), len(raw)))
    # one text row rides along: its features stay byte-stats on the raw
    # payload (the non-decodable path through the same plan)
    rows.append((5, "text/plain", bytearray(b"hello world"), 11))

    df = spark.createDataFrame(
        rows, "doc_id long, modality string, payload binary, n_bytes int"
    ).withColumn("payload_md5", __import__("pyspark").sql.functions.md5("payload"))
    got = {
        r["doc_id"]: r.asDict()
        for r in df.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA).collect()
    }

    for doc_id, (modality, px) in fixtures.items():
        buf = px.reshape(-1).astype(np.int64)
        h = min(16, len(buf))
        r = got[doc_id]
        assert r["f_mean"] == round(float(buf.mean()), 6), doc_id
        assert r["f_head"] == float(buf[:h].sum() % 256), doc_id
        assert r["f_tail"] == float(buf[-h:].sum() % 256), doc_id
        assert r["f_spread"] == float(buf.max() - buf.min()), doc_id

    tbuf = np.frombuffer(b"hello world", dtype=np.uint8).astype(np.int64)
    assert got[5]["f_mean"] == round(float(tbuf.mean()), 6)
    assert got[5]["f_spread"] == float(tbuf.max() - tbuf.min())


# --- PNG (r8: zlib-deflate + per-row filters, stdlib only) --------------------


@pytest.mark.parametrize("h,w", [(1, 1), (1, 7), (9, 1), (2, 3), (16, 16)])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_round_trip_every_filter(h, w, ft):
    """encode→decode bit-exact for every of the five scanline filters
    on random pixels and adversarial shapes (1-pixel rows/cols)."""
    rng = np.random.default_rng(h * 131 + w * 7 + ft)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    from euclid_spark.functions.imaging import decode_png, encode_png

    assert (decode_png(encode_png(px, filter_type=ft)) == px).all()


def test_png_decode_spec_constructed_fixture():
    """Decode a PNG built BY HAND from the public spec (chunks, CRCs,
    filter-0 scanlines via zlib directly) — independent of our encoder,
    so a matched encoder/decoder bug pair cannot hide."""
    import struct
    import zlib

    from euclid_spark.functions.imaging import decode_png

    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
        dtype=np.uint8,
    )
    raw = b"\x00" + px[0].tobytes() + b"\x00" + px[1].tobytes()

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == px).all()


def test_png_crc_verified_and_unsupported_rejected():
    import pytest

    from euclid_spark.functions.imaging import decode_png, encode_png

    px = np.zeros((3, 3, 3), dtype=np.uint8)
    good = bytearray(encode_png(px))
    good[20] ^= 0xFF  # corrupt a header byte under the CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK")


def test_png_truncation_raises_valueerror_not_struct_error():
    """Corrupt/truncated chunk framing must stay inside the ValueError
    quarantine contract — a declared length running past the buffer, a
    cut-off file, or a missing IEND may not escape as struct.error."""
    import pytest

    from euclid_spark.functions.imaging import decode_png, encode_png

    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    good = encode_png(px)
    # cut mid-chunk: declared IDAT length now runs past the end
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_png(good[: len(good) - 20])
    # cut mid-header: fewer than 8 bytes left for length+type
    with pytest.raises(ValueError, match="truncated PNG"):
        decode_png(good[: len(good) - 9])
    # IEND stripped cleanly (last 12 bytes): must be flagged, not EOF-looped
    with pytest.raises(ValueError, match="IEND"):
        decode_png(good[: len(good) - 12])


def test_png_dhash_known_answers_and_brightness_invariance():
    """The C50 perceptual-hash contract holds on PNG payloads exactly
    as on BMP: known-answer dhash on a fixed gradient, and a monotone
    brightness map through a REAL PNG encode→decode round trip leaves
    the hash unchanged."""
    from euclid_spark.functions.imaging import decode_image, encode_png
    from euclid_spark.operators.multimodal import dhash64

    # deterministic gradients: dhash bit = left cell BRIGHTER than right
    x = np.linspace(0, 255, 10, dtype=np.uint8)
    inc = np.stack([np.tile(x, (8, 1))] * 3, axis=-1)
    dec = inc[:, ::-1, :].copy()
    assert dhash64(decode_image(encode_png(inc, filter_type=4))) == 0
    # decreasing: all 64 bits set -> signed-BIGINT fold gives -1
    assert dhash64(decode_image(encode_png(dec, filter_type=1))) == -1
    px = inc
    h_direct = dhash64(px)
    h_png = dhash64(decode_image(encode_png(px, filter_type=4)))
    assert h_png == h_direct
    # monotone brightness map (×0.5) preserves every comparison
    dim = (px.astype(np.uint16) // 2).astype(np.uint8)
    assert dhash64(decode_image(encode_png(dim, filter_type=2))) == h_direct
