"""Audio payload kernel tests."""

from __future__ import annotations

import numpy as np
import pytest

from building2osm_spark.functions import audio as AU


def test_pcm_roundtrip():
    sig = np.sin(np.linspace(0, 20, 4000)) * 0.7
    back = AU.decode_audio(AU.encode_apcm(sig), "apcm")
    assert np.max(np.abs(back - sig)) < 1e-4  # 16-bit quantization


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        AU.decode_audio(b"\x00\x00", "mp3")


def test_audio_features(spark):
    rows = [
        (f"clip_{i}", AU.synthetic_clip(f"clip_{i}"), "apcm") for i in range(40)
    ]
    df = spark.createDataFrame(rows, schema="clip_id string, bytes binary, fmt string")
    feats = {r.clip_id: r for r in AU.audio_features(df).collect()}
    assert len(feats) == 40
    for r in feats.values():
        assert abs(r.duration_s - 0.25) < 1e-9
        assert 0.1 < r.rms < 0.8
        assert 0.0 < r.zcr < 1.0
        assert r.peak <= 1.0
    # deterministic: same id → same features
    again = {r.clip_id: r for r in AU.audio_features(df).collect()}
    assert again["clip_3"].rms == feats["clip_3"].rms
