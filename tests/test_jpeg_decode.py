"""Stdlib baseline JPEG decode (`sources/jpeg.py:decode_jpeg_pixels`):
hand-crafted segment streams with minimal Huffman tables, expectations
computed from the T.81 definitions themselves (direct double-sum IDCT
in the test — independent of the decoder's separable implementation),
plus DC prediction, restart markers, 4:2:0 color conversion, and the
progressive refusal path."""

import math

import pytest

from deltacat_spark.sources.jpeg import _ZZ, decode_jpeg_pixels
from deltacat_spark.sources.multimodal import (
    binary_file_table,
    fake_decode_images,
)

# ---- tiny JPEG writer (test-side, spec-driven) -----------------------

# DC table: categories 0..5 as 3-bit canonical codes 000..101
_DC_COUNTS = bytes([0, 0, 6] + [0] * 13)
_DC_SYMS = bytes([0, 1, 2, 3, 4, 5])
_DC_CODE = {s: (3, s) for s in range(6)}
# AC table: EOB(0x00), run0/size1(0x01), run1/size1(0x11) as 2-bit codes
_AC_COUNTS = bytes([0, 3] + [0] * 14)
_AC_SYMS = bytes([0x00, 0x01, 0x11])
_AC_CODE = {0x00: (2, 0), 0x01: (2, 1), 0x11: (2, 2)}


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt(tid: int = 0) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes([1] * 64))  # all-ones quant


def _sof(w: int, h: int, comps, marker: int = 0xC0) -> bytes:
    body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    body += bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return _seg(marker, body)


def _dht() -> bytes:
    return _seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_SYMS) + _seg(
        0xC4, bytes([0x10]) + _AC_COUNTS + _AC_SYMS
    )


def _sos(comps) -> bytes:
    body = bytes([len(comps)])
    for cid in comps:
        body += bytes([cid, 0x00])
    return _seg(0xDA, body + bytes([0, 63, 0]))


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value: int, n: int):
        for k in range(n - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def block(self, dc_diff: int, ac: "dict | None" = None):
        """One 8x8 block: DC category+magnitude, then only the simple
        AC shapes the test tables support (zigzag k=1 / k=2, |v|=1)."""
        t = 0 if dc_diff == 0 else abs(dc_diff).bit_length()
        assert t <= 5
        self.put(*reversed(_DC_CODE[t]))  # (code, length) -> put(code, len)
        if t:
            mag = dc_diff if dc_diff > 0 else dc_diff + (1 << t) - 1
            self.put(mag, t)
        k = 1
        for kk in sorted((ac or {}).keys()):
            v = ac[kk]
            assert v in (1, -1)
            run = kk - k
            assert run in (0, 1)
            code = 0x01 if run == 0 else 0x11
            self.put(*reversed(_AC_CODE[code]))
            self.put(1 if v > 0 else 0, 1)
            k = kk + 1
        self.put(*reversed(_AC_CODE[0x00]))  # EOB

    def payload(self) -> bytes:
        bits = self.bits + [1] * ((-len(self.bits)) % 8)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            raw.append(b)
            if b == 0xFF:
                raw.append(0x00)  # byte stuffing
        return bytes(raw)


def _gray_jpeg(w, h, blocks, dri: int = 0, marker: int = 0xC0) -> bytes:
    bw = _BitWriter()
    entropy = b""
    for i, (dc, ac) in enumerate(blocks):
        if dri and i and i % dri == 0:
            entropy += bw.payload() + bytes([0xFF, 0xD0 + (i // dri - 1) % 8])
            bw = _BitWriter()
        bw.block(dc, ac)
    entropy += bw.payload()
    out = b"\xff\xd8" + _dqt() + _sof(w, h, [(1, 1, 1, 0)], marker) + _dht()
    if dri:
        out += _seg(0xDD, dri.to_bytes(2, "big"))
    return out + _sos([1]) + entropy + b"\xff\xd9"


def _ref_idct(coef_natural):
    """Direct T.81 A.3.3 double sum — the spec formula, no separation."""

    def c(u):
        return math.sqrt(0.5) if u == 0 else 1.0

    out = []
    for y in range(8):
        for x in range(8):
            s = 0.25 * sum(
                c(u)
                * c(v)
                * coef_natural[8 * v + u]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
                for u in range(8)
                for v in range(8)
            )
            p = int(math.floor(s + 0.5)) + 128
            out.append(min(255, max(0, p)))
    return out


def test_dc_only_flat_gray():
    jpg = _gray_jpeg(8, 8, [(16, None)])
    w, h, ch, px = decode_jpeg_pixels(jpg)
    assert (w, h, ch) == (8, 8, 1)
    assert set(px) == {130}  # round(16/8) + 128


def test_ac_coefficients_match_spec_idct():
    # S(u=1,v=0) = +1 (zigzag k=1) and S(u=0,v=1) = -1 (zigzag k=2)
    jpg = _gray_jpeg(8, 8, [(4, {1: 1, 2: -1})])
    w, h, ch, px = decode_jpeg_pixels(jpg)
    coef = [0] * 64
    coef[0] = 4
    coef[_ZZ[1]] = 1
    coef[_ZZ[2]] = -1
    assert list(px) == _ref_idct(coef)


def test_dc_prediction_across_blocks():
    # diffs 16 then 8: second block's S00 = 24
    jpg = _gray_jpeg(16, 8, [(16, None), (8, None)])
    w, h, ch, px = decode_jpeg_pixels(jpg)
    assert (w, h) == (16, 8)
    row = px[:16]
    assert set(row[:8]) == {130} and set(row[8:]) == {131}


def test_restart_marker_resets_prediction():
    # DRI=1: second block's predictor resets, S00 = 8 -> 129
    jpg = _gray_jpeg(16, 8, [(16, None), (8, None)], dri=1)
    w, h, ch, px = decode_jpeg_pixels(jpg)
    row = px[:16]
    assert set(row[:8]) == {130} and set(row[8:]) == {129}


def test_color_420_flat_conversion():
    # one 16x16 MCU: four flat Y blocks (S00=24 -> Y=131), one Cb
    # (-16 -> 126), one Cr (16 -> 130)
    bw = _BitWriter()
    bw.block(24, None)
    for _ in range(3):
        bw.block(0, None)  # Y DC pred carries: still 24
    bw.block(-16, None)  # Cb
    bw.block(16, None)  # Cr
    jpg = (
        b"\xff\xd8"
        + _dqt()
        + _sof(16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + _dht()
        + _sos([1, 2, 3])
        + bw.payload()
        + b"\xff\xd9"
    )
    w, h, ch, px = decode_jpeg_pixels(jpg)
    assert (w, h, ch) == (16, 16, 3)
    # Y=131, Cb-128=-2, Cr-128=2 -> R=134, G=130, B=127
    assert set(px[0::3]) == {134}
    assert set(px[1::3]) == {130}
    assert set(px[2::3]) == {127}


def test_dimension_crop_of_partial_mcu():
    # 12x5 grayscale: 2x1 blocks decoded, output cropped to 12x5
    jpg = _gray_jpeg(12, 5, [(16, None), (8, None)])
    w, h, ch, px = decode_jpeg_pixels(jpg)
    assert (w, h, ch) == (12, 5, 1)
    assert len(px) == 60
    assert set(px[:8]) == {130} and set(px[8:12]) == {131}


def test_arithmetic_coding_raises_not_implemented():
    # SOF9 (arithmetic sequential) stays a documented boundary;
    # progressive (SOF2) decodes — see test_jpeg_progressive.py
    jpg = _gray_jpeg(8, 8, [(16, None)], marker=0xC9)
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg_pixels(jpg)


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"nope")
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\xff\xd8\xff\xd9")  # EOI before SOS
    jpg = _gray_jpeg(8, 8, [(16, None)])
    with pytest.raises(ValueError):
        decode_jpeg_pixels(jpg[:40])  # truncated mid-segment


def test_real_decode_spark_path_jpeg(spark, tmp_path):
    d = tmp_path / "jpgs"
    d.mkdir()
    (d / "a.jpg").write_bytes(_gray_jpeg(8, 8, [(16, None)]))
    (d / "b.jpg").write_bytes(_gray_jpeg(16, 8, [(16, None), (8, None)]))
    bf = binary_file_table(spark, str(d))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in fake_decode_images(
        bf, decode="real"
    ).collect()}
    assert rows["a.jpg"].magic == "jpeg"
    assert (rows["a.jpg"].width, rows["a.jpg"].height) == (8, 8)
    assert set(bytes(rows["a.jpg"].pixels)) == {130}
    assert (rows["b.jpg"].width, rows["b.jpg"].height) == (16, 8)
