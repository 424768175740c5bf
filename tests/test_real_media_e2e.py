"""Guarded REAL-container media e2e (VERDICT r10 directive 8): a tiny
PNG / FLAC / MP4 corpus through the perceptual + robust dedup
pipelines and the media-dedup CLI verb.  Every test importorskips its
decoder (PIL / soundfile / PyAV) — absent in this container, so these
skip cleanly here and arm automatically where the dependencies exist.
The dependency-free quarantine twins (PPM/WAV synthetic corpora) keep
the kernels covered either way (tests/test_media_dedup.py)."""

import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from paradump_spark.cli import main
from paradump_spark.operators import multimodal as MM


def _rng_image(seed: int, w: int = 48, h: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth gradient + low-freq noise: perceptually hashable content
    # (pure noise dHashes unstably under re-encode)
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    base = (x + y) / 2 + rng.normal(0, 12, (h, w))
    img = np.clip(base, 0, 255).astype(np.uint8)
    return np.stack([img, 255 - img, img // 2], axis=2)


def test_real_image_png_dedup_e2e(spark, tmp_path):
    PIL_Image = pytest.importorskip("PIL.Image")

    def png(img: np.ndarray) -> bytes:
        buf = io.BytesIO()
        PIL_Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()

    def jpeg(img: np.ndarray) -> bytes:
        buf = io.BytesIO()
        PIL_Image.fromarray(img).save(buf, format="JPEG", quality=90)
        return buf.getvalue()

    rows = []
    for g in range(6):
        img = _rng_image(g)
        rows.append((10 * g, png(img)))                      # keeper
        rows.append((10 * g + 1, jpeg(img)))                 # re-encode
        bright = np.clip(img.astype(np.int16) + 12, 0, 255).astype(np.uint8)
        rows.append((10 * g + 2, png(bright)))               # brightness
    src = str(tmp_path / "png_src")
    spark.createDataFrame(rows, "doc_id long, payload binary").write.parquet(src)

    out = str(tmp_path / "png_flags")
    rc = main([
        "media-dedup", "--input", src, "--modality", "image",
        "--output", out, "--keep-flags",
    ])
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.where(F.col("decode_error").isNotNull()).count() == 0
    # each family keeps exactly its min id; re-encode + brightness flagged
    flagged = {r["doc_id"] for r in back.where("is_image_dup").collect()}
    keepers = {r["doc_id"] for r in back.where("NOT is_image_dup").collect()}
    assert {10 * g for g in range(6)} <= keepers
    assert flagged == {10 * g + k for g in range(6) for k in (1, 2)}


def _sine(rate: int, sec: float, freqs=(440.0, 661.0)) -> np.ndarray:
    t = np.arange(int(rate * sec)) / rate
    x = sum(np.sin(2 * np.pi * f * t) * a
            for f, a in zip(freqs, (0.6, 0.3)))
    # slow amplitude envelope so energy-difference fingerprints carry bits
    return (x * (0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * t))).astype(np.float64)


def test_real_audio_flac_robust_e2e(spark, tmp_path):
    sf = pytest.importorskip("soundfile")

    rate = 16_000

    def flac(samples: np.ndarray) -> bytes:
        buf = io.BytesIO()
        sf.write(buf, samples, rate, format="FLAC")
        return buf.getvalue()

    rows = []
    for g in range(4):
        clip = _sine(rate, 2.0, freqs=(300.0 + 90 * g, 700.0 + 45 * g))
        rows.append((10 * g, flac(clip)))                    # keeper
        rows.append((10 * g + 1, flac(clip * 0.7)))          # gain re-encode
        trim = clip[int(0.2 * rate):]                        # 200 ms trim
        rows.append((10 * g + 2, flac(trim)))
    src = str(tmp_path / "flac_src")
    spark.createDataFrame(rows, "doc_id long, payload binary").write.parquet(src)

    out = str(tmp_path / "flac_flags")
    rc = main([
        "media-dedup", "--input", src, "--modality", "audio", "--robust",
        "--output", out, "--keep-flags",
    ])
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.where(F.col("decode_error").isNotNull()).count() == 0
    flagged = {r["doc_id"] for r in back.where("is_audio_dup").collect()}
    # gain and trim variants merge into the keeper's family
    assert flagged == {10 * g + k for g in range(4) for k in (1, 2)}


def test_real_video_mp4_robust_e2e(spark, tmp_path):
    av = pytest.importorskip("av")

    w, h, fps = 64, 48, 8

    def mp4(frames: list) -> bytes:
        buf = io.BytesIO()
        with av.open(buf, "w", format="mp4") as container:
            stream = container.add_stream("mpeg4", rate=fps)
            stream.width, stream.height = w, h
            stream.pix_fmt = "yuv420p"
            for arr in frames:
                frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
                for pkt in stream.encode(frame):
                    container.mux(pkt)
            for pkt in stream.encode():
                container.mux(pkt)
        return buf.getvalue()

    def clip(seed: int, n: int = 16) -> list:
        return [_rng_image(seed * 100 + i, w, h) for i in range(n)]

    rows = []
    for g in range(3):
        frames = clip(g)
        rows.append((10 * g, mp4(frames)))                   # keeper
        rows.append((10 * g + 1, mp4(frames[4:])))           # cut-down copy
    src = str(tmp_path / "mp4_src")
    spark.createDataFrame(rows, "doc_id long, payload binary").write.parquet(src)

    out = str(tmp_path / "mp4_flags")
    rc = main([
        "media-dedup", "--input", src, "--modality", "video", "--robust",
        "--min-matches", "3",
        "--output", out, "--keep-flags",
    ])
    assert rc == 0
    back = spark.read.parquet(out)
    assert back.where(F.col("decode_error").isNotNull()).count() == 0
    flagged = {r["doc_id"] for r in back.where("is_video_dup").collect()}
    # lossy codec: require at least the cut-down copies to merge
    assert flagged == {10 * g + 1 for g in range(3)}
