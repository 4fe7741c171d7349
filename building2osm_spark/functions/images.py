"""Image payload kernels over the Iceberg-shaped images table (F21).

The input table (BASELINE.json input_hint) carries opaque `bytes` with
typed metadata (w, h, fmt). Decode / feature-extract / resize run as
Arrow-batched mapInPandas kernels: bytes never expand into Spark rows —
each batch decodes to numpy, computes, and emits compact features.

Codecs implemented in numpy (PIL absent in this sandbox): raw RGB,
uncompressed BMP24, and 6-bit-quantized qraw (the lossy PSNR≥40dB case).
Standard codecs (jpeg/png/webp) are STUBBED: decode_image raises
NotImplementedError with a clear message — the Spark-side plumbing
(schemas, batch shapes, partitioning) is identical whichever decoder is
plugged in.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.fixtures import (
    _pixels_for,
    average_phash,
    decode_image,
    encode_raw,
    psnr,
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("std_gray", T.DoubleType()),
        T.StructField("phash_decoded", T.LongType()),
    ]
)


def decode_features(df: DataFrame) -> DataFrame:
    """(image_id, mean_r/g/b, std_gray, phash_decoded) — the decode +
    feature-extract stage. phash_decoded re-derives the perceptual hash
    from the actual bytes (consistency check against the phash column)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "mean_r", "mean_g", "mean_b", "std_gray", "phash_decoded")}
            for img_id, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                pix = decode_image(bytes(data), fmt, int(w), int(h))
                gray = pix.astype(np.float64).mean(axis=2)
                out["image_id"].append(img_id)
                out["mean_r"].append(float(pix[:, :, 0].mean()))
                out["mean_g"].append(float(pix[:, :, 1].mean()))
                out["mean_b"].append(float(pix[:, :, 2].mean()))
                out["std_gray"].append(float(gray.std()))
                out["phash_decoded"].append(average_phash(pix))
            yield pd.DataFrame(out)

    return df.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_block_mean(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Downsample every image to (out_w, out_h) by block mean, emitting
    fmt='raw' bytes — the thumbnail/feature-pyramid stage. Input sizes must
    be multiples of the output (the fixture sizes 16/32/64 are)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, ws, hs, fmts = [], [], [], [], []
            for img_id, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                pix = decode_image(bytes(data), fmt, int(w), int(h)).astype(np.float64)
                bh, bw = int(h) // out_h, int(w) // out_w
                small = pix.reshape(out_h, bh, out_w, bw, 3).mean(axis=(1, 3))
                ids.append(img_id)
                blobs.append(encode_raw(np.round(small).astype(np.uint8)))
                ws.append(np.int32(out_w))
                hs.append(np.int32(out_h))
                fmts.append("raw")
            yield pd.DataFrame(
                {"image_id": ids, "bytes": blobs, "w": ws, "h": hs, "fmt": fmts}
            )

    return df.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def frame_sample(df: DataFrame, every: int = 2) -> DataFrame:
    """Video payload → every-kth frame as raw image rows (the multimodal
    frame-sampling stage). fmt='vraw' is the engine's synthetic container:
    n concatenated h*w*3 raw RGB frames. Real containers (mp4/webm) need
    codec libraries absent from this sandbox — they raise with a clear
    message; the Spark plumbing (schema, batching, fan-out) is identical
    whichever demuxer is plugged in."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, ws, hs, fmts = [], [], [], [], [], []
            for img_id, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                if fmt != "vraw":
                    raise NotImplementedError(
                        f"container {fmt!r}: real demuxers (mp4/webm) need "
                        "codec libraries not present in this sandbox"
                    )
                frame_size = int(w) * int(h) * 3
                n_frames = len(data) // frame_size
                for fi in range(0, n_frames, every):
                    ids.append(img_id)
                    idxs.append(np.int32(fi))
                    blobs.append(bytes(data[fi * frame_size : (fi + 1) * frame_size]))
                    ws.append(np.int32(w))
                    hs.append(np.int32(h))
                    fmts.append("raw")
            yield pd.DataFrame(
                {
                    "image_id": ids, "frame_idx": idxs, "bytes": blobs,
                    "w": ws, "h": hs, "fmt": fmts,
                }
            )

    return df.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel, schema=FRAME_SCHEMA
    )


DISPATCH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def decode_dispatch(df: DataFrame) -> DataFrame:
    """(image_id, fmt, ok, error) — graceful-degradation decode over a
    mixed-format corpus: each row's payload is dispatched through
    decode_image; unsupported containers (the NotImplementedError codec
    boundary, sources/fixtures.py:128) become a per-row (ok=false, error)
    record instead of failing the job. Supported rows are genuinely
    decoded (a corrupt payload surfaces as ok=false too), so a green run
    proves BOTH directions of the contract: every supported format
    decodes, every unsupported format degrades to a recorded error."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, oks, errs = [], [], [], []
            for img_id, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                try:
                    decode_image(bytes(data), fmt, int(w), int(h))
                    ok, err = True, None
                except NotImplementedError as e:
                    ok, err = False, str(e)
                except Exception as e:  # noqa: BLE001
                    # per-row degradation IS this operator's contract: a
                    # payload that fails its decoder for ANY reason
                    # (truncated bmp header → struct.error, wrong bpp →
                    # AssertionError, null bytes → TypeError, size
                    # mismatch → ValueError/IndexError) must become an
                    # (ok=false, error) record, never a job failure.
                    ok, err = False, f"corrupt payload: {type(e).__name__}: {e}"
                ids.append(img_id)
                fmts.append(fmt)
                oks.append(ok)
                errs.append(err)
            yield pd.DataFrame(
                {"image_id": ids, "fmt": fmts, "ok": oks, "error": errs}
            )

    return df.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel, schema=DISPATCH_SCHEMA
    )


ORACLE_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("phash_ok", T.BooleanType()),
    ]
)


def verify_against_oracle(df: DataFrame) -> DataFrame:
    """Per-row invariant check (BASELINE.json input_hint): decoded pixels
    vs the deterministic oracle pixels (PSNR, ∞ for lossless formats,
    ≥40 dB required for lossy), caption template equality, and phash
    consistency. The oracle pixels are re-generated from image_id inside
    the kernel — no second table needs to ship. Contract: rows from the
    DEFAULT corpus (content keyed by the row's own image_id); planted
    near-dup rows (content redirected to another id) are out of scope."""
    from ..sources.fixtures import caption_for

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, psnrs, caps, phs = [], [], [], []
            for img_id, data, fmt, w, h, caption, phash in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"],
                pdf["caption"], pdf["phash"],
            ):
                pix = decode_image(bytes(data), fmt, int(w), int(h))
                oracle = _pixels_for(img_id, int(w), int(h))
                want_caption = caption_for(int(img_id.split("_")[1]))
                ids.append(img_id)
                psnrs.append(psnr(oracle, pix))
                caps.append(caption == want_caption)
                phs.append(int(phash) == average_phash(pix))
            yield pd.DataFrame(
                {"image_id": ids, "psnr_db": psnrs, "caption_ok": caps, "phash_ok": phs}
            )

    return df.mapInPandas(kernel, schema=ORACLE_CHECK_SCHEMA)
