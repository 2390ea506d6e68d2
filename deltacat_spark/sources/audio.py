"""Stdlib audio/video probing + real WAV PCM decode for multimodal
columns.

Reference surface: media datastore types AUDIO/VIDEO
(`types/media.py:353-420`) delegate decoding to Ray Data datasources;
this environment has no audio/video libraries, so — as with the image
family (`sources/images.py`, `sources/jpeg.py`) — the formats whose
specs are parseable with the stdlib decode for REAL and the rest stay
explicit NotImplementedError integration points:

- WAV (RIFF/WAVE): full real decode — fmt/data chunk walk, PCM 8/16/32
  bit and IEEE float samples, then vectorized numpy features (duration,
  RMS, peak, zero-crossing rate) per channel-interleaved frame.
- MP4/ISO-BMFF: real *metadata* decode — box walk to ftyp brand,
  mvhd timescale/duration, tkhd track dimensions. FRAME decode (H.264
  etc.) is codec work the stdlib cannot do: `NotImplementedError`.

Scale shape: payloads stream through `mapInPandas` Arrow batches (the
same plumbing as image decode) — one Python pass per binary blob, no
driver materialization, features computed vectorized in numpy.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def parse_wav(payload: bytes) -> dict:
    """RIFF/WAVE parse → format metadata + raw PCM bytes.

    Returns {channels, sample_rate, bits, n_frames, audio_format,
    pcm (bytes)}. Handles PCM (format 1) and IEEE float (format 3);
    anything else (ADPCM, MP3-in-WAV) raises NotImplementedError.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            (
                audio_format,
                channels,
                sample_rate,
                _byte_rate,
                block_align,
                bits,
            ) = struct.unpack("<HHIIHH", body[:16])
            fmt = {
                "audio_format": audio_format,
                "channels": channels,
                "sample_rate": sample_rate,
                "block_align": block_align,
                "bits": bits,
            }
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAVE missing fmt or data chunk")
    if fmt["audio_format"] not in (1, 3):
        raise NotImplementedError(
            f"WAVE audio format {fmt['audio_format']} (only PCM/float "
            "decode stdlib-side)"
        )
    fmt["n_frames"] = len(pcm) // max(fmt["block_align"], 1)
    fmt["pcm"] = pcm
    return fmt


def encode_wav(
    pcm: bytes, sample_rate: int, channels: int = 1, bits: int = 16
) -> bytes:
    """Little-endian PCM bytes → RIFF/WAVE container (the write half of
    the audio path — pipelines that emit clips as binary columns encode
    executor-side). `pcm` is raw interleaved samples: unsigned for
    8-bit, signed LE for 16/32-bit."""
    if bits not in (8, 16, 32):
        raise ValueError(f"bits must be 8/16/32, got {bits}")
    block_align = channels * bits // 8
    if len(pcm) % max(block_align, 1):
        raise ValueError("pcm length is not a whole number of frames")
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_samples(meta: dict):
    """PCM bytes → float64 numpy array shaped (frames, channels),
    normalized to [-1, 1]."""
    import numpy as np

    bits = meta["bits"]
    ch = meta["channels"]
    pcm = meta["pcm"]
    if meta["audio_format"] == 3:
        dt = np.float32 if bits == 32 else np.float64
        x = np.frombuffer(pcm, dtype=np.dtype(dt).newbyteorder("<")).astype(
            np.float64
        )
    elif bits == 8:
        # 8-bit WAV is UNSIGNED, midpoint 128
        x = (
            np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif bits == 16:
        x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        x = np.frombuffer(pcm, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    frames = len(x) // ch
    return x[: frames * ch].reshape(frames, ch)


def wav_features(payload: bytes) -> dict:
    """One blob → audio features (vectorized numpy, no Python loop over
    samples): duration, RMS, peak, zero-crossing rate."""
    import numpy as np

    meta = parse_wav(payload)
    x = wav_samples(meta)
    mono = x.mean(axis=1) if x.shape[1] > 1 else x[:, 0]
    n = len(mono)
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return {
        "format": "wav",
        "channels": meta["channels"],
        "sample_rate": meta["sample_rate"],
        "bits": meta["bits"],
        "n_frames": meta["n_frames"],
        "duration_s": meta["n_frames"] / meta["sample_rate"]
        if meta["sample_rate"]
        else None,
        "rms": float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        "peak": float(np.max(np.abs(mono))) if n else 0.0,
        "zero_cross_rate": (zc / (n - 1)) if n > 1 else 0.0,
    }


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format
# ---------------------------------------------------------------------------


def parse_mp4_meta(payload: bytes) -> dict:
    """ISO-BMFF box walk → container metadata: major brand, movie
    duration (mvhd), track dimensions (tkhd). Frame/codec decode is out
    of stdlib reach and raises in `decode_video_frames`."""
    out: dict = {"format": "mp4", "brand": None, "duration_s": None,
                 "width": None, "height": None, "n_tracks": 0}

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack(">I", payload[pos : pos + 4])[0]
            btype = payload[pos + 4 : pos + 8]
            body_off = pos + 8
            if size == 1:  # 64-bit largesize
                size = struct.unpack(">Q", payload[pos + 8 : pos + 16])[0]
                body_off = pos + 16
            if size == 0:
                size = hi - pos
            if size < 8 or pos + size > hi:
                return
            body = payload[body_off : pos + size]
            if btype == b"ftyp":
                out["brand"] = body[:4].decode("ascii", "replace")
            elif btype in (b"moov", b"trak", b"mdia"):
                walk(body_off, pos + size)
            elif btype == b"mvhd":
                ver = body[0]
                if ver == 1:
                    timescale, duration = struct.unpack(">IQ", body[20:32])
                else:
                    timescale, duration = struct.unpack(">II", body[12:20])
                if timescale:
                    out["duration_s"] = duration / timescale
            elif btype == b"tkhd":
                out["n_tracks"] += 1
                ver = body[0]
                base = 88 if ver == 1 else 76
                if len(body) >= base + 8:
                    w = struct.unpack(">I", body[base : base + 4])[0] / 65536
                    h = struct.unpack(">I", body[base + 4 : base + 8])[0] / 65536
                    if w and h:  # video track (audio tracks carry 0x0)
                        out["width"] = int(w)
                        out["height"] = int(h)
            pos += size

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (mp4) payload")
    walk(0, len(payload))
    return out


def decode_video_frames(payload: bytes):
    """Codec-level frame decode — env-blocked (no av/ffmpeg libraries);
    the honest integration point, mirroring the image family's policy:
    never fake pixels on the real path."""
    raise NotImplementedError(
        "video frame decode needs a codec library (e.g. PyAV) not present "
        "in this environment; container metadata via parse_mp4_meta, "
        "frame-sampling plumbing via multimodal.frame_sample"
    )


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)

MEDIA_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def decode_audio(df: DataFrame) -> DataFrame:
    """(path, content) → WAV features, Arrow-batched. Rows whose payload
    isn't decodable carry the reason in `error` instead of failing the
    job (corrupt blobs are data, not exceptions, at corpus scale)."""

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content)
                row = {
                    "path": path,
                    "n_bytes": len(payload),
                    "format": None,
                    "channels": None,
                    "sample_rate": None,
                    "bits": None,
                    "n_frames": None,
                    "duration_s": None,
                    "rms": None,
                    "peak": None,
                    "zero_cross_rate": None,
                    "error": None,
                }
                try:
                    row.update(wav_features(payload))
                except (ValueError, NotImplementedError) as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA])

    return df.select("path", "content").mapInPandas(_decode, AUDIO_SCHEMA)


def probe_media(df: DataFrame) -> DataFrame:
    """(path, content) → container metadata for mp4/wav payloads —
    duration, dimensions, track count — without decoding any frame."""

    def _probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content)
                row = {
                    "path": path,
                    "n_bytes": len(payload),
                    "format": None,
                    "brand": None,
                    "duration_s": None,
                    "width": None,
                    "height": None,
                    "n_tracks": None,
                    "error": None,
                }
                try:
                    if payload[:4] == b"RIFF":
                        meta = parse_wav(payload)
                        row.update(
                            format="wav",
                            duration_s=meta["n_frames"] / meta["sample_rate"]
                            if meta["sample_rate"]
                            else None,
                            n_tracks=meta["channels"],
                        )
                    else:
                        row.update(parse_mp4_meta(payload))
                except (ValueError, NotImplementedError) as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_PROBE_SCHEMA]
            )

    return df.select("path", "content").mapInPandas(_probe, MEDIA_PROBE_SCHEMA)
