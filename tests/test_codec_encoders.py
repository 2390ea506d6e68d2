"""Encoder halves of the multimodal codecs: encode→decode must be the
identity for every scanline filter type, channel count, and PCM bit
depth the decoders support."""

import struct

import pytest

from deltacat_spark.sources.audio import encode_wav, parse_wav, wav_samples
from deltacat_spark.sources.images import encode_png
from deltacat_spark.sources.multimodal import decode_png_pixels


def _pixels(w, h, ch, seed=0):
    return bytes(
        (seed + y * 29 + x * 17 + c * 11) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_channel(ft, ch):
    w, h = 7, 5  # odd width so bpp offsets are exercised off-alignment
    px = _pixels(w, h, ch, seed=ft * 31 + ch)
    blob = encode_png(w, h, ch, px, filters=ft)
    w2, h2, ch2, out = decode_png_pixels(blob)
    assert (w2, h2, ch2) == (w, h, ch)
    assert out == px


def test_png_roundtrip_mixed_filters_per_row():
    w, h, ch = 8, 10, 3
    px = _pixels(w, h, ch, seed=99)
    blob = encode_png(w, h, ch, px, filters=[y % 5 for y in range(h)])
    assert decode_png_pixels(blob)[3] == px


def test_png_encode_validates():
    with pytest.raises(ValueError):
        encode_png(2, 2, 5, bytes(20))
    with pytest.raises(ValueError):
        encode_png(2, 2, 3, bytes(11))  # wrong length
    with pytest.raises(ValueError):
        encode_png(2, 2, 3, bytes(12), filters=[0])  # wrong filter count
    with pytest.raises(ValueError):
        encode_png(2, 2, 3, bytes(12), filters=7)


@pytest.mark.parametrize("bits,fmt,scale", [(16, "<h", 32768.0), (32, "<i", 2147483648.0)])
def test_wav_roundtrip_signed(bits, fmt, scale):
    vals = [-1000, 0, 1, 999, -32768 if bits == 16 else -(2**31)]
    pcm = b"".join(struct.pack(fmt, v) for v in vals)
    blob = encode_wav(pcm, 44100, channels=1, bits=bits)
    meta = parse_wav(blob)
    assert meta["sample_rate"] == 44100
    assert meta["bits"] == bits
    assert meta["n_frames"] == len(vals)
    x = wav_samples(meta)
    assert [round(v * scale) for v in x[:, 0]] == vals


def test_wav_roundtrip_8bit_stereo_and_odd_data_padding():
    pcm = bytes([0, 128, 255, 64, 200, 1])  # 3 stereo frames, unsigned
    blob = encode_wav(pcm, 8000, channels=2, bits=8)
    meta = parse_wav(blob)
    assert meta["channels"] == 2 and meta["n_frames"] == 3
    assert meta["pcm"] == pcm
    # odd-length data chunk must be word-aligned in the container
    blob2 = encode_wav(bytes([5]), 8000, channels=1, bits=8)
    assert parse_wav(blob2)["pcm"] == bytes([5])


def test_wav_encode_validates():
    with pytest.raises(ValueError):
        encode_wav(bytes(3), 8000, channels=1, bits=16)  # ragged frames
    with pytest.raises(ValueError):
        encode_wav(bytes(4), 8000, bits=24)
