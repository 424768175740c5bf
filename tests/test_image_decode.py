"""Real image decode (operators/multimodal.py): PPM/PGM/BMP parse
without PIL, feature extraction and nearest-neighbor resize end-to-end
through Spark, undecodable payloads quarantined not crashed, and a
PIL-guarded PNG path where the dependency exists."""

import struct

import numpy as np
import pytest

from paradump_spark.operators.multimodal import (
    IMAGE_FEATURE_SCHEMA,
    _encode_ppm,
    decode_image,
    image_features,
    resize_image,
)

# 2x2 RGB test pixels (row-major, top-down)
PIXELS = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
)


def ppm_bytes(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n# comment line\n%d %d\n255\n" % (w, h) + img.tobytes()


def bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB BMP: bottom-up rows, 4-byte row padding."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in img[::-1]:  # bottom-up
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + body


def test_ppm_decode_exact():
    assert np.array_equal(decode_image(ppm_bytes(PIXELS)), PIXELS)


def test_pgm_decode_replicates_gray_to_rgb():
    gray = np.array([[0, 128], [255, 7]], dtype=np.uint8)
    data = b"P5\n2 2\n255\n" + gray.tobytes()
    img = decode_image(data)
    assert img.shape == (2, 2, 3)
    assert np.array_equal(img[..., 0], gray)
    assert np.array_equal(img[..., 1], gray)


def test_bmp_decode_exact():
    # width 3 forces row padding (9 bytes -> stride 12)
    img = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    assert np.array_equal(decode_image(bmp_bytes(img)), img)


def test_undecodable_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\nnot really")


def _media_df(spark, rows):
    return spark.createDataFrame(
        [
            (
                i,
                payload,
                ("image", None, None, None, None),
            )
            for i, payload in rows
        ],
        "doc_id long, payload binary, media_meta struct<media_type:string,"
        "codec:string,width:int,height:int,duration_ms:bigint>",
    )


def test_image_features_spark(spark):
    df = _media_df(
        spark,
        [(1, ppm_bytes(PIXELS)), (2, bmp_bytes(PIXELS)), (3, b"JUNKJUNK")],
    )
    got = {r["doc_id"]: r for r in image_features(df).collect()}
    for i in (1, 2):
        assert (got[i]["width"], got[i]["height"]) == (2, 2)
        assert got[i]["decode_error"] is None
        want = PIXELS.mean(axis=(0, 1))
        assert np.allclose(got[i]["mean_rgb"], want)
    assert got[3]["width"] is None
    assert "NotImplementedError" in got[3]["decode_error"]
    assert image_features(df).schema == IMAGE_FEATURE_SCHEMA


def test_resize_image_spark(spark):
    big = np.repeat(np.repeat(PIXELS, 2, axis=0), 2, axis=1)  # 4x4
    df = _media_df(spark, [(1, ppm_bytes(big)), (2, b"JUNK")])
    out = {r["doc_id"]: r for r in resize_image(df, 2, 2).collect()}
    # nearest-neighbor 4x4 -> 2x2 picks pixels (0,0),(0,2),(2,0),(2,2)
    assert np.array_equal(decode_image(bytes(out[1]["payload"])), PIXELS)
    assert out[1]["media_meta"]["width"] == 2
    assert out[1]["media_meta"]["codec"] == "ppm"
    assert out[1]["decode_error"] is None
    # quarantined row passes through unchanged
    assert bytes(out[2]["payload"]) == b"JUNK"
    assert out[2]["decode_error"] is not None


def test_encode_decode_roundtrip():
    img = np.random.default_rng(7).integers(0, 256, (5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_encode_ppm(img)), img)


def test_png_via_pillow(spark):
    """Runs only where Pillow exists (not this sandbox): the SAME
    operators must handle compressed formats through the PIL path."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.fromarray(PIXELS).save(buf, format="PNG")
    df = _media_df(spark, [(1, buf.getvalue())])
    r = image_features(df).collect()[0]
    assert (r["width"], r["height"]) == (2, 2)
    assert r["decode_error"] is None
    assert np.allclose(r["mean_rgb"], PIXELS.mean(axis=(0, 1)))


# ---------------------------------------------------------------------------
# WAV/PCM audio decode (round 5)


def wav_bytes(samples, sample_rate=8000, bits=16, audio_format=1):
    """Minimal RIFF/WAVE: samples is (n_frames, n_channels) float in
    [-1, 1]."""
    arr = np.asarray(samples, dtype=np.float64)
    n_ch = arr.shape[1]
    if audio_format == 1 and bits == 16:
        raw = (arr * 32767).astype("<i2").tobytes()
    elif audio_format == 1 and bits == 8:
        raw = ((arr * 127) + 128).astype(np.uint8).tobytes()
    elif audio_format == 3 and bits == 32:
        raw = arr.astype("<f4").tobytes()
    else:
        raise ValueError
    block = n_ch * bits // 8
    fmt = (
        audio_format.to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(raw).to_bytes(4, "little") + raw
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_wav_decode_roundtrip():
    from paradump_spark.operators.multimodal import decode_audio

    t = np.linspace(0, 1, 8000, endpoint=False)
    stereo = np.stack([np.sin(2 * np.pi * 440 * t), 0.5 * np.cos(2 * np.pi * 220 * t)], axis=1)
    x, sr = decode_audio(wav_bytes(stereo, 8000, bits=16))
    assert sr == 8000 and x.shape == (8000, 2)
    # encode truncation (1 LSB) + the 32767-encode/32768-decode scale
    assert np.allclose(x, stereo, atol=2.5 / 32768)
    xf, _ = decode_audio(wav_bytes(stereo, 8000, bits=32, audio_format=3))
    assert np.allclose(xf, stereo, atol=1e-6)
    x8, _ = decode_audio(wav_bytes(stereo, 8000, bits=8))
    assert np.allclose(x8, stereo, atol=0.02)


def test_wav_rejects_non_wav():
    from paradump_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish bytes")


def test_audio_features_spark(spark):
    from paradump_spark.operators.multimodal import (
        AUDIO_FEATURE_SCHEMA,
        audio_features,
    )

    t = np.linspace(0, 0.5, 4000, endpoint=False)
    mono = np.sin(2 * np.pi * 440 * t).reshape(-1, 1)
    df = spark.createDataFrame(
        [(1, wav_bytes(mono, 8000)), (2, b"not audio at all")],
        "doc_id long, payload binary",
    )
    out = audio_features(df)
    assert out.schema == AUDIO_FEATURE_SCHEMA
    got = {r["doc_id"]: r for r in out.collect()}
    r1 = got[1]
    assert (r1["sample_rate"], r1["n_channels"], r1["duration_ms"]) == (8000, 1, 500)
    assert abs(r1["rms"] - 1 / np.sqrt(2)) < 1e-3  # sine RMS
    assert abs(r1["peak"] - 1.0) < 1e-3
    assert r1["decode_error"] is None
    assert got[2]["sample_rate"] is None
    assert "NotImplementedError" in got[2]["decode_error"]


# ---------------------------------------------------------------------------
# PPM-stream frame sampling (round 5)


def test_ppm_stream_frame_sampling(spark):
    from paradump_spark.operators.multimodal import (
        decode_image,
        sample_frames_real,
        split_ppm_stream,
    )

    frames = [
        np.full((2, 2, 3), v, dtype=np.uint8) for v in (0, 50, 100, 150, 200, 250)
    ]
    stream = b"".join(ppm_bytes(f) for f in frames)
    assert len(split_ppm_stream(stream)) == 6
    df = spark.createDataFrame(
        [(1, stream), (2, b"not a stream")], "doc_id long, payload binary"
    )
    rows = sample_frames_real(df, n_frames=3).collect()
    ok = sorted(
        (r["frame_idx"], r["stream_pos"]) for r in rows if r["doc_id"] == 1
    )
    assert ok == [(0, 0), (1, 2), (2, 4)]  # evenly spaced over 6 frames
    for r in rows:
        if r["doc_id"] == 1:
            img = decode_image(bytes(r["frame_payload"]))
            want = frames[r["stream_pos"]]
            assert np.array_equal(img, want)
            assert r["decode_error"] is None
    bad = [r for r in rows if r["doc_id"] == 2]
    assert len(bad) == 1 and bad[0]["decode_error"] is not None


def test_ppm_stream_short_stream_yields_what_it_has(spark):
    from paradump_spark.operators.multimodal import sample_frames_real

    stream = ppm_bytes(PIXELS) + ppm_bytes(PIXELS)
    df = spark.createDataFrame([(1, stream)], "doc_id long, payload binary")
    rows = sample_frames_real(df, n_frames=5).collect()
    assert len(rows) == 2  # only 2 frames exist


# ---------------------------------------------------------------------------
# guarded optional decoders (round 6): soundfile / PyAV container paths.
# Absent in this container -> the guarded tests skip; the quarantine
# tests below prove the absent-dependency behavior instead.

_HAS_SF = __import__("importlib").util.find_spec("soundfile") is not None
_HAS_AV = __import__("importlib").util.find_spec("av") is not None


@pytest.mark.skipif(not _HAS_SF, reason="soundfile not installed")
def test_flac_decode_via_soundfile():
    import io

    import soundfile as sf

    from paradump_spark.operators.multimodal import decode_audio

    t = np.linspace(0, 0.25, 2000, endpoint=False)
    mono = (0.4 * np.sin(2 * np.pi * 330 * t)).reshape(-1, 1)
    buf = io.BytesIO()
    sf.write(buf, mono, 8000, format="FLAC")
    x, sr = decode_audio(buf.getvalue())
    assert sr == 8000 and x.shape == (2000, 1)
    assert np.allclose(x, mono, atol=1e-3)


@pytest.mark.skipif(not _HAS_SF, reason="soundfile not installed")
def test_ogg_decode_via_soundfile():
    import io

    import soundfile as sf

    from paradump_spark.operators.multimodal import decode_audio

    t = np.linspace(0, 0.25, 2000, endpoint=False)
    mono = (0.4 * np.sin(2 * np.pi * 330 * t)).reshape(-1, 1)
    buf = io.BytesIO()
    sf.write(buf, mono, 8000, format="OGG", subtype="VORBIS")
    x, sr = decode_audio(buf.getvalue())
    assert sr == 8000 and abs(x.shape[0] - 2000) < 200  # lossy codec pads


@pytest.mark.skipif(not _HAS_AV, reason="PyAV not installed")
def test_mp3_decode_via_av():
    import io

    import av

    from paradump_spark.operators.multimodal import decode_audio

    t = np.linspace(0, 0.5, 4000, endpoint=False)
    mono16 = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp3") as out:
        stream = out.add_stream("mp3", rate=8000)
        frame = av.AudioFrame.from_ndarray(
            mono16.reshape(1, -1), format="s16", layout="mono"
        )
        frame.sample_rate = 8000
        for pkt in stream.encode(frame):
            out.mux(pkt)
        for pkt in stream.encode(None):
            out.mux(pkt)
    x, sr = decode_audio(buf.getvalue())
    assert sr == 8000 and x.shape[1] == 1
    assert abs(x.shape[0] - 4000) < 2000  # mp3 coder padding


@pytest.mark.skipif(not _HAS_AV, reason="PyAV not installed")
def test_mp4_frame_sampling_via_av(spark):
    import io

    import av

    from paradump_spark.operators.multimodal import (
        decode_image,
        sample_frames_real,
    )

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        stream = out.add_stream("h264", rate=4)
        stream.width, stream.height, stream.pix_fmt = 64, 48, "yuv420p"
        for i in range(8):
            img = np.full((48, 64, 3), i * 30, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for pkt in stream.encode(frame):
                out.mux(pkt)
        for pkt in stream.encode(None):
            out.mux(pkt)
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "doc_id long, payload binary"
    )
    rows = sample_frames_real(df, n_frames=4).collect()
    ok = [r for r in rows if r["decode_error"] is None]
    assert len(ok) == 4
    img = decode_image(ok[0]["frame_payload"])  # PPM interchange holds
    assert img.shape == (48, 64, 3)


@pytest.mark.skipif(_HAS_SF or _HAS_AV, reason="optional decoders present")
def test_container_audio_quarantines_without_decoders():
    from paradump_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError, match="soundfile or PyAV"):
        decode_audio(b"\x00\x00\x00\x18ftypmp42 fake mp4 bytes")


@pytest.mark.skipif(_HAS_AV, reason="PyAV present")
def test_container_video_quarantines_without_av(spark):
    from paradump_spark.operators.multimodal import sample_frames_real

    df = spark.createDataFrame(
        [(7, b"\x00\x00\x00\x18ftypisom fake mp4")],
        "doc_id long, payload binary",
    )
    rows = sample_frames_real(df, n_frames=2).collect()
    assert len(rows) == 1
    assert "PyAV" in rows[0]["decode_error"]
    assert rows[0]["frame_payload"] is None


def test_partial_decoder_rejection_reports_missing_dependency(monkeypatch):
    """ADVICE r06: one decoder installed-but-rejecting + the other
    absent is a MISSING-DEPENDENCY situation (the absent decoder might
    handle the container) — NotImplementedError with the install hint,
    not ValueError 'bad data'."""
    from paradump_spark.operators import multimodal as MM

    monkeypatch.setattr(
        MM, "_soundfile_decode",
        lambda data: (_ for _ in ()).throw(RuntimeError("format rejected")),
    )
    monkeypatch.setattr(MM, "_av_decode_audio", lambda data: None)
    with pytest.raises(NotImplementedError, match="PyAV"):
        MM.decode_audio(b"\xff\xfb\x90fake mp3 frame")

    # both installed and both rejecting IS bad data -> ValueError
    monkeypatch.setattr(
        MM, "_av_decode_audio",
        lambda data: (_ for _ in ()).throw(RuntimeError("also rejected")),
    )
    with pytest.raises(ValueError, match="undecodable audio container"):
        MM.decode_audio(b"\xff\xfb\x90fake mp3 frame")
