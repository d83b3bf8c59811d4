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
