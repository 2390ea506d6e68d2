"""Baseline JPEG encoder (`sources/jpeg.py::encode_jpeg_gray`, unit
quantization with fixed canonical tables) and MJPEG frame streams
(`encode_mjpeg`/`split_mjpeg_frames`, `multimodal.decode_mjpeg_frames`).

The encoder's conformance was additionally cross-checked against an
independent decoder (JDK ImageIO recovers the encoded bytes exactly,
modulo its own gray color-space transform); these tests pin the
in-repo contract: blockwise-flat images round-trip LOSSLESSLY, general
images round-trip within FDCT rounding, and frame split/decode is
exact per frame.
"""

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_gray,
    encode_mjpeg,
    split_mjpeg_frames,
)


def test_flat_block_roundtrip_lossless():
    w, h = 32, 24
    px = bytes(
        ((x // 8) * 37 + (y // 8) * 91 + 13) % 256
        for y in range(h)
        for x in range(w)
    )
    blob = encode_jpeg_gray(w, h, px)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert decode_jpeg_pixels(blob) == (w, h, 1, px)


def test_arbitrary_image_roundtrip_within_rounding():
    import random

    rng = random.Random(7)
    w, h = 16, 16
    px = bytes(rng.randrange(256) for _ in range(w * h))
    _, _, _, out = decode_jpeg_pixels(encode_jpeg_gray(w, h, px))
    assert max(abs(a - b) for a, b in zip(out, px)) <= 2


def test_encoder_validation():
    with pytest.raises(ValueError, match="multiple-of-8"):
        encode_jpeg_gray(10, 8, bytes(80))
    with pytest.raises(ValueError, match="does not match"):
        encode_jpeg_gray(8, 8, bytes(63))


def test_mjpeg_split_exact():
    frames = [
        encode_jpeg_gray(8, 8, bytes([v]) * 64) for v in (0, 255, 128, 17)
    ]
    stream = encode_mjpeg(frames)
    assert split_mjpeg_frames(stream) == frames
    with pytest.raises(ValueError, match="EOI"):
        split_mjpeg_frames(stream[:-1])
    with pytest.raises(ValueError, match="no JPEG frames"):
        split_mjpeg_frames(b"not a stream")
    with pytest.raises(ValueError, match="SOI"):
        encode_mjpeg([b"nope"])


def test_decode_mjpeg_frames_spark_path(spark):
    from deltacat_spark.sources.multimodal import decode_mjpeg_frames

    rows = []
    for doc in range(4):
        frames = [
            encode_jpeg_gray(8, 8, bytes([(doc * 50 + f * 30) % 256]) * 64)
            for f in range(5)
        ]
        rows.append((str(doc), encode_mjpeg(frames)))
    df = spark.createDataFrame(rows, "path string, content binary")
    out = decode_mjpeg_frames(df, every_n=2, max_frames=2).collect()
    # frames 0 and 2 of each stream
    assert len(out) == 8
    for r in out:
        assert (r.width, r.height, r.channels) == (8, 8, 1)
        doc = int(r.path)
        want = (doc * 50 + r.frame_no * 30) % 256
        assert bytes(r.pixels) == bytes([want]) * 64
    assert sorted({r.frame_no for r in out}) == [0, 2]


def test_mjpeg_split_survives_ffd9_inside_app_segment():
    """Real camera frames carry EXIF/APPn payloads that can contain a
    literal FFD9; the segment-grammar walk must not split there."""
    base = encode_jpeg_gray(8, 8, bytes([70]) * 64)
    evil_app1 = (
        b"\xff\xe1" + (10).to_bytes(2, "big") + b"ab\xff\xd9\xff\xd8cd"
    )
    frame = base[:2] + evil_app1 + base[2:]
    assert decode_jpeg_pixels(frame)[:3] == (8, 8, 1)
    other = encode_jpeg_gray(8, 8, bytes([200]) * 64)
    got = split_mjpeg_frames(encode_mjpeg([frame, other]))
    assert got == [frame, other]
    # and the frames still decode to their own pixels
    assert decode_jpeg_pixels(got[0])[3] == bytes([70]) * 64
    assert decode_jpeg_pixels(got[1])[3] == bytes([200]) * 64
