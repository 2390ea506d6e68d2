"""Audio/video multimodal tests (`sources/audio.py`).

Reference surface: media DatastoreTypes AUDIO/VIDEO
(`types/media.py:353-420`). WAV decodes for real (RIFF parse + numpy
features); MP4 decodes container metadata (box walk); frame decode is
the documented env-blocked integration point. Fixtures are hand-built
bytes — the stdlib `wave` writer for WAV ground truth, raw box
concatenation for MP4."""

import io
import math
import struct
import wave

import pytest

from deltacat_spark.sources.audio import (
    decode_audio,
    decode_video_frames,
    parse_mp4_meta,
    parse_wav,
    probe_media,
    wav_features,
    wav_samples,
)


def make_wav(
    freq=440.0, rate=8000, seconds=0.5, channels=1, amp=0.5, bits=16
) -> bytes:
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    n = int(rate * seconds)
    frames = bytearray()
    for i in range(n):
        v = amp * math.sin(2 * math.pi * freq * i / rate)
        if bits == 16:
            s = struct.pack("<h", int(v * 32767))
        else:
            s = struct.pack("<B", int(v * 127) + 128)
        frames += s * channels
    w.writeframes(bytes(frames))
    w.close()
    return buf.getvalue()


def test_parse_wav_fields_match_wave_module():
    payload = make_wav(rate=8000, seconds=0.25, channels=2)
    meta = parse_wav(payload)
    assert meta["channels"] == 2
    assert meta["sample_rate"] == 8000
    assert meta["bits"] == 16
    assert meta["n_frames"] == 2000
    assert len(meta["pcm"]) == 2000 * 2 * 2


def test_wav_features_sine_ground_truth():
    # full-scale-ish sine: RMS = amp/sqrt(2), peak ≈ amp, ZCR ≈ 2f/rate
    f = wav_features(make_wav(freq=400.0, rate=8000, seconds=1.0, amp=0.8))
    assert f["duration_s"] == pytest.approx(1.0)
    assert f["rms"] == pytest.approx(0.8 / math.sqrt(2), rel=1e-3)
    assert f["peak"] == pytest.approx(0.8, rel=1e-2)
    assert f["zero_cross_rate"] == pytest.approx(2 * 400 / 8000, rel=0.02)


def test_wav_8bit_unsigned_midpoint():
    f = wav_features(make_wav(bits=8, amp=0.5, seconds=0.2))
    assert f["bits"] == 8
    # silence-centered: mean magnitude near amp/sqrt(2), not shifted
    assert f["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=0.05)


def test_wav_stereo_samples_shape():
    x = wav_samples(parse_wav(make_wav(channels=2, seconds=0.1)))
    assert x.shape == (800, 2)


def test_parse_wav_rejects_non_riff_and_exotic_codecs():
    with pytest.raises(ValueError):
        parse_wav(b"\x00" * 64)
    # fabricate an ADPCM fmt chunk (format 2)
    body = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)
    payload = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + body
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        parse_wav(payload)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def make_mp4(duration_s=2.5, timescale=1000, w=640, h=360) -> bytes:
    mvhd = bytes([0]) + b"\x00" * 11 + struct.pack(
        ">II", timescale, int(duration_s * timescale)
    ) + b"\x00" * 80
    tkhd = bytes([0]) + b"\x00" * 75 + struct.pack(
        ">II", w << 16, h << 16
    )
    trak = _box(b"trak", _box(b"tkhd", tkhd))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov


def test_parse_mp4_meta_duration_and_dims():
    meta = parse_mp4_meta(make_mp4(duration_s=2.5, w=640, h=360))
    assert meta["brand"] == "isom"
    assert meta["duration_s"] == pytest.approx(2.5)
    assert (meta["width"], meta["height"]) == (640, 360)
    assert meta["n_tracks"] == 1


def test_parse_mp4_rejects_non_bmff():
    with pytest.raises(ValueError):
        parse_mp4_meta(b"RIFFxxxxWAVE")


def test_video_frame_decode_is_honest_stub():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_video_frames(make_mp4())


def test_spark_decode_audio_and_probe(spark):
    wav1 = make_wav(freq=440, seconds=0.5)
    wav2 = make_wav(freq=880, seconds=0.25, channels=2)
    mp4 = make_mp4(duration_s=3.0, w=1280, h=720)
    df = spark.createDataFrame(
        [("a.wav", bytearray(wav1)), ("b.wav", bytearray(wav2)),
         ("c.mp4", bytearray(mp4)), ("junk.bin", bytearray(b"\x00" * 32))],
        "path string, content binary",
    ).repartition(2)

    audio = {r.path: r for r in decode_audio(df).collect()}
    assert audio["a.wav"].duration_s == pytest.approx(0.5)
    assert audio["b.wav"].channels == 2
    assert audio["a.wav"].error is None
    assert audio["c.mp4"].error is not None  # not a WAV — recorded, not raised
    assert audio["junk.bin"].error is not None

    probe = {r.path: r for r in probe_media(df).collect()}
    assert probe["c.mp4"].format == "mp4"
    assert probe["c.mp4"].duration_s == pytest.approx(3.0)
    assert (probe["c.mp4"].width, probe["c.mp4"].height) == (1280, 720)
    assert probe["a.wav"].format == "wav"
    assert probe["a.wav"].duration_s == pytest.approx(0.5)
    assert probe["junk.bin"].error is not None
