"""Image payload kernels: codecs, phash consistency, PSNR invariant."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from building2osm_spark.functions import images as IM
from building2osm_spark.sources import fixtures as FX


def test_codecs_roundtrip():
    pix = FX._pixels_for("img_000000000007", 32, 16)
    assert FX.decode_raw(FX.encode_raw(pix), 32, 16).tolist() == pix.tolist()
    assert FX.decode_bmp(FX.encode_bmp(pix)).tolist() == pix.tolist()
    q = FX.decode_qraw(FX.encode_qraw(pix), 32, 16)
    assert FX.psnr(pix, q) >= 40.0  # the lossy invariant with margin


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        FX.decode_image(b"\xff\xd8\xff", "jpeg", 8, 8)


def test_phash_stability():
    pix = FX._pixels_for("img_000000000003", 64, 64)
    p1 = FX.average_phash(pix)
    assert p1 == FX.average_phash(pix.copy())
    # a heavily altered image gets a different hash
    other = FX._pixels_for("img_000000000004", 64, 64)
    assert p1 != FX.average_phash(other)


def test_decode_features_and_oracle_check(spark):
    df = FX.spark_images(spark, 120)
    feats = IM.decode_features(df).collect()
    assert len(feats) == 120
    by_id = {r.image_id: r for r in feats}
    raw = {r["image_id"]: r for r in df.select("image_id", "fmt", "phash").collect()}
    for img_id, r in by_id.items():
        assert 0 <= r.mean_r <= 255
        # phash column was computed from decoded bytes at generation time:
        # re-derivation must agree exactly
        assert r.phash_decoded == raw[img_id]["phash"]

    checks = IM.verify_against_oracle(df).collect()
    assert len(checks) == 120
    for r in checks:
        assert r.caption_ok and r.phash_ok
        assert r.psnr_db >= 40.0


def test_frame_sample_vraw(spark):
    import pytest as _pytest

    # synthetic 'vraw' videos: 6 concatenated 8×8 raw frames per row
    rows = []
    for i in range(5):
        frames = [FX._pixels_for(f"vid_{i}_{f}", 8, 8) for f in range(6)]
        data = b"".join(FX.encode_raw(p) for p in frames)
        rows.append((f"vid_{i}", data, 8, 8, "vraw"))
    df = spark.createDataFrame(
        rows, schema="image_id string, bytes binary, w int, h int, fmt string"
    )
    sampled = IM.frame_sample(df, every=2).collect()
    assert len(sampled) == 5 * 3  # frames 0, 2, 4
    for r in sampled:
        assert r.fmt == "raw" and len(r.bytes) == 8 * 8 * 3
    # sampled frame 2 of vid_0 equals the original frame 2
    want = FX.encode_raw(FX._pixels_for("vid_0_2", 8, 8))
    got = next(bytes(r.bytes) for r in sampled if r.image_id == "vid_0" and r.frame_idx == 2)
    assert got == want

    # real containers are stubbed with a clear error
    bad = spark.createDataFrame(
        [("x", b"\x00\x00", 8, 8, "mp4")],
        schema="image_id string, bytes binary, w int, h int, fmt string",
    )
    with _pytest.raises(Exception, match="demuxers"):
        IM.frame_sample(bad).collect()


def test_distributed_generator_matches_local(spark):
    # executor-side generation must be row-identical to the driver-side
    # generator (same pure function of image_id)
    d = FX.distributed_images(spark, 150).orderBy("image_id").collect()
    l = FX.images_pdf(150)
    assert [r.image_id for r in d] == list(l["image_id"])
    assert [r.phash for r in d] == list(l["phash"])
    for r, (_, row) in zip(d, l.iterrows()):
        assert bytes(r.bytes) == bytes(row["bytes"])
        assert r.caption == row["caption"]


def test_resize_block_mean(spark):
    df = FX.spark_images(spark, 30)
    small = IM.resize_block_mean(df, 8, 8)
    rows = small.collect()
    assert len(rows) == 30
    for r in rows:
        assert r.w == 8 and r.h == 8 and r.fmt == "raw"
        assert len(r.bytes) == 8 * 8 * 3
    # resized pixels approximate the oracle block means
    r0 = rows[0]
    orig = df.filter(F.col("image_id") == r0.image_id).first()
    pix = FX.decode_image(bytes(orig.bytes), orig.fmt, orig.w, orig.h).astype(np.float64)
    bh, bw = orig.h // 8, orig.w // 8
    want = np.round(pix.reshape(8, bh, 8, bw, 3).mean(axis=(1, 3))).astype(np.uint8)
    got = FX.decode_raw(bytes(r0.bytes), 8, 8)
    assert np.array_equal(got, want)


def test_decode_dispatch_graceful(spark):
    """Graceful degradation at the codec boundary: unsupported containers
    and corrupt payloads become per-row (ok=false, error) records; every
    supported row genuinely decodes."""
    df = FX.spark_images(spark, 40)
    idx = F.substring("image_id", 5, 12).cast("int")
    mixed = df.withColumn(
        "fmt", F.when(idx % 4 == 3, F.lit("png")).otherwise(F.col("fmt"))
    )
    rows = {r.image_id: r for r in IM.decode_dispatch(mixed).collect()}
    assert len(rows) == 40
    for img_id, r in rows.items():
        i = int(img_id.split("_")[1])
        if i % 4 == 3:
            assert not r.ok and "png" in r.error and "codecs" in r.error
        else:
            assert r.ok and r.error is None

    # corrupt payload (truncated raw bytes): recorded, not raised
    bad = spark.createDataFrame(
        [("x", b"\x00\x01", "raw", 16, 16)],
        schema="image_id string, bytes binary, fmt string, w int, h int",
    )
    r = IM.decode_dispatch(bad).first()
    assert not r.ok and r.error.startswith("corrupt payload")

    # every decoder failure mode degrades per-row, whatever the exception
    # type: truncated bmp header (struct.error), wrong-bpp bmp
    # (AssertionError), null payload (TypeError) — none may fail the job
    pix = FX._pixels_for("disp", 16, 16)
    bmp8 = bytearray(FX.encode_bmp(pix))
    bmp8[28:30] = (8).to_bytes(2, "little")  # bpp 24 → 8
    hard = spark.createDataFrame(
        [
            ("bmp_trunc", b"BM\x01", "bmp", 16, 16),
            ("bmp_bpp8", bytes(bmp8), "bmp", 16, 16),
            ("null_bytes", None, "raw", 16, 16),
            ("fine", FX.encode_raw(pix), "raw", 16, 16),
        ],
        schema="image_id string, bytes binary, fmt string, w int, h int",
    )
    got = {r.image_id: r for r in IM.decode_dispatch(hard).collect()}
    assert got["fine"].ok and got["fine"].error is None
    for bad_id in ("bmp_trunc", "bmp_bpp8", "null_bytes"):
        assert not got[bad_id].ok, bad_id
        assert got[bad_id].error.startswith("corrupt payload"), bad_id
