"""C40 audio-energy pipeline vs a pure-numpy reference."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

def test_audio_energy_matches_numpy_reference(spark):
    """C40: the distributed windowed-RMS pipeline must agree with a
    plain-numpy reference computed from the same payload bytes."""
    import numpy as np

    from euclid_spark.operators.multimodal import (
        AUDIO_WIN,
        SILENCE_RMS,
        mm_audio_energy,
        with_binary_payload,
    )

    got = {
        r["doc_id"]: (
            r["n_samples"], r["n_windows"],
            r["rms_mean"], r["rms_max"], r["silence_frac"],
        )
        for r in mm_audio_energy(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in with_binary_payload(docs).select("doc_id", "payload").collect()
    }
    assert set(got) == set(payloads)
    for doc_id, payload in payloads.items():
        payload = payload[: len(payload) // 2 * 2]
        x = np.frombuffer(payload, dtype="<i2").astype(np.float64)
        nw = len(x) // AUDIO_WIN
        if nw == 0:
            want = (len(x), 0, 0.0, 0.0, 0.0)
        else:
            w = x[: nw * AUDIO_WIN].reshape(nw, AUDIO_WIN)
            rms = np.sqrt((w * w).mean(axis=1))
            want = (
                len(x), nw,
                round(float(rms.mean()), 4),
                round(float(rms.max()), 4),
                round(float((rms < SILENCE_RMS).mean()), 4),
            )
        assert got[doc_id] == want, doc_id


def test_dhash_known_answer_and_invariance():
    """C50: dHash bits follow the left>right rule exactly, and uniform
    brightness/contrast maps (monotone, non-clipping) leave the hash
    unchanged — the invariance that makes dHash a perceptual signature
    rather than a byte hash."""
    import numpy as np

    from euclid_spark.functions.imaging import decode_bmp, encode_bmp
    from euclid_spark.operators.multimodal import dhash64

    # decreasing horizontal gradient: every left cell brighter → all 64
    # bits set → signed-int64 value -1
    px = np.tile((230 - np.arange(24) * 9).astype(np.uint8), (24, 1))
    px = px[:, :, None].repeat(3, axis=2)
    assert dhash64(px) == -1
    # increasing gradient → no bit set
    assert dhash64(px[:, ::-1]) == 0
    # brightness + contrast shift (no clipping) preserves the hash,
    # through a REAL encode/decode round trip
    shifted = (px.astype(np.float64) * 0.6 + 30).astype(np.uint8)
    assert dhash64(decode_bmp(encode_bmp(shifted))) == dhash64(px)
    # a transposed image is a different picture → different hash
    assert dhash64(px.transpose(1, 0, 2)) != dhash64(px)


def test_image_dhash_flags_planted_near_dups(spark, tmp_path, monkeypatch):
    """C50 end-to-end: identical texts → identical images → hamming-0
    pair; a lightly edited text → small hamming, still flagged; an
    unrelated text stays unflagged."""
    from euclid_spark.operators.multimodal import (
        DHASH_MAX_HAMMING,
        mm_image_dhash,
    )

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    base = "perceptual hashing turns images into tiny comparable codes " * 8
    rows = [
        (1, base),
        (2, base),                       # exact dup → hamming 0
        (3, base[:-30] + "x" * 30),      # local edit → small hamming
        (4, "Z" * 900),                  # unrelated flat image
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm_image_dhash(spark, str(tmp_path)).collect()
    }
    assert got.get((1, 2)) == 0
    assert (1, 3) in got and 0 < got[(1, 3)] <= DHASH_MAX_HAMMING
    assert all(4 not in p for p in got)


def test_image_dhash_quarantines_corrupt_payloads(spark, tmp_path, monkeypatch):
    """A corrupt payload must quarantine (dhash NULL + decode_error),
    not kill the job; intact rows still match. Injected by corrupting
    one doc's payload through a monkeypatched payload builder."""
    from euclid_spark.operators import multimodal as mm

    monkeypatch.setenv("EUCLID_SPARK_ARTIFACTS", str(tmp_path / "_arts"))
    base = "the same text twice makes an exact image pair " * 10
    rows = [(1, base), (2, base), (3, "corrupt me")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")

    real_with_image_payload = mm.with_image_payload

    def corrupted(docs):
        out = real_with_image_payload(docs)
        from pyspark.sql import functions as F

        # truncate doc 3's BMP to 10 bytes — an invalid header/body
        return out.withColumn(
            "payload",
            F.when(
                F.col("doc_id") == 3, F.substring("payload", 1, 10)
            ).otherwise(F.col("payload")),
        )

    monkeypatch.setattr(mm, "with_image_payload", corrupted)
    sig = {
        r["doc_id"]: r for r in mm.image_dhashes(spark, str(tmp_path)).collect()
    }
    assert sig[3]["dhash"] is None and sig[3]["decode_error"]
    assert sig[1]["dhash"] is not None and sig[1]["decode_error"] is None
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in mm.mm_image_dhash(
            spark, str(tmp_path)
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
