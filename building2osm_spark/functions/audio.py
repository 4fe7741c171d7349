"""Audio payload kernels (multimodal plumbing, task brief).

Synthetic container 'apcm': mono PCM int16 little-endian at a nominal
16 kHz. Feature extraction (RMS, zero-crossing rate, peak, duration) runs
as Arrow-batched numpy over mapInPandas — the same shape as the image
kernels. Real codecs (mp3/flac/ogg) need audio libraries absent from this
sandbox and raise a clear NotImplementedError; the Spark-side plumbing is
identical whichever decoder is plugged in.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SAMPLE_RATE = 16000


def encode_apcm(samples: np.ndarray) -> bytes:
    """float [-1, 1] → int16 little-endian PCM bytes."""
    return (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """bytes → float64 samples in [-1, 1]."""
    if fmt == "apcm":
        return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    raise NotImplementedError(
        f"codec {fmt!r}: real decoders (mp3/flac/ogg) need audio libraries "
        "not present in this sandbox; plug a decoder into decode_audio"
    )


def synthetic_clip(clip_id: str, seconds: float = 0.25) -> bytes:
    """Deterministic test clip: two sines + noise seeded from the id."""
    from ..sources.fixtures import fnv1a64

    h = int(fnv1a64(clip_id))
    rng = np.random.default_rng(h & 0xFFFFFFFF)
    n = int(SAMPLE_RATE * seconds)
    t = np.arange(n) / SAMPLE_RATE
    f1 = 200 + (h % 800)
    f2 = 1000 + ((h >> 16) % 3000)
    sig = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(2 * np.pi * f2 * t)
    sig += 0.05 * rng.standard_normal(n)
    return encode_apcm(sig * 0.8)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """(clip_id, duration_s, rms, zcr, peak) from (clip_id, bytes, fmt)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, durs, rmss, zcrs, peaks = [], [], [], [], []
            for clip_id, data, fmt in zip(pdf["clip_id"], pdf["bytes"], pdf["fmt"]):
                x = decode_audio(bytes(data), fmt)
                ids.append(clip_id)
                durs.append(len(x) / SAMPLE_RATE)
                rmss.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                zcrs.append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if len(x) > 1 else 0.0
                )
                peaks.append(float(np.abs(x).max()) if len(x) else 0.0)
            yield pd.DataFrame(
                {"clip_id": ids, "duration_s": durs, "rms": rmss, "zcr": zcrs, "peak": peaks}
            )

    return df.select("clip_id", "bytes", "fmt").mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA
    )
