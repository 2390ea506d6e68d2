"""Stdlib PNG pixel decode (`sources/multimodal.py:decode_png_pixels`):
hand-computed expectations per filter type (encoder-independent — the
filtered bytes and expected pixels come straight from PNG spec §9
arithmetic), a forward-filter round-trip over random images for every
color type, and the `decode="real"` mapInPandas path end-to-end.

Reference capability parity: image datasets (`deltacat/types/media.py:
353-420`) — the reference delegates pixels to Ray Data image readers;
here PNG decodes with zlib alone so only JPEG/video remain env-blocked.
"""

import random
import struct
import zlib

import pytest

from deltacat_spark.sources.multimodal import (
    binary_file_table,
    decode_png_pixels,
    fake_decode_images,
)

_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def _png_from_filtered(
    width, height, color_type, filtered, bit_depth=8, plte=None,
    interlace=0, trns=None,
) -> bytes:
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(bytes(filtered)))
    return out + _chunk(b"IEND", b"")


def _encode(width, height, color_type, pixels, filters, plte=None):
    """Forward PNG filtering (spec §9) applied row-by-row — the test's
    own independent implementation, used for round-trip checks."""
    ch = _CH[color_type]
    stride = width * ch
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        raw.append(f)
        enc = bytearray(line)
        if f == 1:
            for x in range(stride - 1, ch - 1, -1):
                enc[x] = (enc[x] - line[x - ch]) & 0xFF
        elif f == 2:
            for x in range(stride):
                enc[x] = (enc[x] - prior[x]) & 0xFF
        elif f == 3:
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                enc[x] = (enc[x] - ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                enc[x] = (enc[x] - pred) & 0xFF
        raw += enc
        prior = line
    return _png_from_filtered(width, height, color_type, raw, plte=plte)


# ---- hand-computed filter arithmetic (independent of any encoder) ----


def test_filter_none_rgb():
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    filtered = b"\x00" + px[:6] + b"\x00" + px[6:]
    w, h, ch, out = decode_png_pixels(_png_from_filtered(2, 2, 2, filtered))
    assert (w, h, ch) == (2, 2, 3)
    assert out == px


def test_filter_sub_hand_computed():
    # one RGB row, filter 1: recon(x) = raw(x) + recon(x - 3)
    filtered = bytes([1, 10, 20, 30, 5, 5, 5, 1, 2, 3])
    w, h, ch, out = decode_png_pixels(_png_from_filtered(3, 1, 2, filtered))
    assert out == bytes([10, 20, 30, 15, 25, 35, 16, 27, 38])


def test_filter_up_hand_computed():
    # grayscale 3x2: row0 plain, row1 adds the prior row
    filtered = bytes([0, 1, 2, 3, 2, 10, 20, 30])
    w, h, ch, out = decode_png_pixels(_png_from_filtered(3, 2, 0, filtered))
    assert out == bytes([1, 2, 3, 11, 22, 33])


def test_filter_average_hand_computed():
    # gray 2x2: row1 x0: 5 + (0+10)//2 = 10; x1: 7 + (10+20)//2 = 22
    filtered = bytes([0, 10, 20, 3, 5, 7])
    w, h, ch, out = decode_png_pixels(_png_from_filtered(2, 2, 0, filtered))
    assert out == bytes([10, 20, 10, 22])


def test_filter_paeth_hand_computed():
    # gray 2x2 row1: x0 pred=b=10 -> 11; x1 a=11,b=20,c=10 -> pred=b -> 22
    filtered = bytes([0, 10, 20, 4, 1, 2])
    w, h, ch, out = decode_png_pixels(_png_from_filtered(2, 2, 0, filtered))
    assert out == bytes([10, 20, 11, 22])


def test_filter_wraparound_mod_256():
    # Sub filter overflow: 200 + 100 = 300 -> 44 (mod 256)
    filtered = bytes([1, 200, 100])
    w, h, ch, out = decode_png_pixels(_png_from_filtered(2, 1, 0, filtered))
    assert out == bytes([200, 44])


def test_palette_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    filtered = bytes([0, 0, 2, 0, 1, 1])  # 2x2 indices
    w, h, ch, out = decode_png_pixels(
        _png_from_filtered(2, 2, 3, filtered, plte=plte)
    )
    assert (ch, out) == (
        3,
        bytes([255, 0, 0, 0, 0, 255, 0, 255, 0, 0, 255, 0]),
    )


def test_palette_trns_expands_rgba():
    plte = bytes([9, 8, 7, 1, 2, 3])
    filtered = bytes([0, 0, 1])
    w, h, ch, out = decode_png_pixels(
        _png_from_filtered(2, 1, 3, filtered, plte=plte, trns=bytes([128]))
    )
    # index 0 has tRNS alpha 128; index 1 past the tRNS table -> opaque
    assert (ch, out) == (4, bytes([9, 8, 7, 128, 1, 2, 3, 255]))


# ---- round-trip: random pixels through the test's forward filter ----


@pytest.mark.parametrize("color_type", [0, 2, 4, 6])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_roundtrip_all_color_types_and_filters(color_type, filters):
    rng = random.Random(color_type * 31 + sum(filters))
    w, h = 7, 5
    ch = _CH[color_type]
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    got = decode_png_pixels(_encode(w, h, color_type, px, filters))
    assert got == (w, h, ch, px)


def test_roundtrip_palette():
    rng = random.Random(99)
    plte = bytes(rng.randrange(256) for _ in range(3 * 16))
    idx = bytes(rng.randrange(16) for _ in range(6 * 4))
    w, h, ch, out = decode_png_pixels(
        _encode(6, 4, 3, idx, [0, 2], plte=plte)
    )
    want = b"".join(plte[3 * i : 3 * i + 3] for i in idx)
    assert (w, h, ch) == (6, 4, 3) and out == want


def test_multi_idat_chunks_concatenate():
    px = bytes(range(12))
    z = zlib.compress(b"\x00" + px[:6] + b"\x00" + px[6:])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", z[:5])
        + _chunk(b"IDAT", z[5:])
        + _chunk(b"IEND", b"")
    )
    assert decode_png_pixels(payload) == (2, 2, 3, px)


# ---- refusal paths: wrong depth/interlace/corruption never garbage ----


def test_16bit_depth_raises_not_implemented():
    png = _png_from_filtered(1, 1, 0, bytes([0, 1, 2]), bit_depth=16)
    with pytest.raises(NotImplementedError):
        decode_png_pixels(png)


def test_interlace_raises_not_implemented():
    png = _png_from_filtered(1, 1, 0, bytes([0, 1]), interlace=1)
    with pytest.raises(NotImplementedError):
        decode_png_pixels(png)


def test_corrupt_streams_raise_value_error():
    with pytest.raises(ValueError):
        decode_png_pixels(b"\x89PNG\r\n\x1a\njunk")  # no IHDR/IDAT
    with pytest.raises(ValueError):
        # IDAT shorter than one scanline
        decode_png_pixels(_png_from_filtered(4, 4, 2, bytes([0, 1, 2])))
    with pytest.raises(ValueError):
        # bad filter code
        decode_png_pixels(_png_from_filtered(1, 1, 0, bytes([9, 1])))
    with pytest.raises(ValueError):
        decode_png_pixels(b"nopng")


# ---- the decode="real" Spark path end-to-end ----


def test_real_decode_spark_path(spark, tmp_path):
    d = tmp_path / "pngs"
    d.mkdir()
    rng = random.Random(7)
    want = {}
    for i in range(3):
        w, h = 4 + i, 3 + i
        px = bytes(rng.randrange(256) for _ in range(w * h * 3))
        (d / f"img_{i}.png").write_bytes(
            _encode(w, h, 2, px, [0, 1, 2, 3, 4])
        )
        want[f"img_{i}.png"] = (w, h, 3, px)
    bf = binary_file_table(spark, str(d))
    rows = fake_decode_images(bf, decode="real").collect()
    assert len(rows) == 3
    for r in rows:
        name = r.path.rsplit("/", 1)[-1]
        w, h, ch, px = want[name]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert bytes(r.pixels) == px
        assert r.magic == "png"
