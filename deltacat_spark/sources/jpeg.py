"""Baseline JPEG pixel decode with the stdlib alone (ITU T.81 sequential
DCT, Huffman entropy coding): segment parse → Huffman block decode →
dequantize → separable float IDCT → chroma upsample → YCbCr→RGB.

Supports what training corpora overwhelmingly carry: 8-bit baseline
(SOF0) and extended-sequential (SOF1) scans, grayscale and 3-component
YCbCr with any h×v sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart
markers, multi-table DQT/DHT. Progressive (SOF2), arithmetic coding,
12-bit precision and hierarchical modes raise NotImplementedError — a
real cluster wires libjpeg-turbo for those.

Like `decode_png_pixels` this runs inside `mapInPandas` executors over
Arrow batches: per-pixel Python cost parallelizes with partitions and
the driver never touches pixels.

Reference capability parity: image datasets (`deltacat/types/media.py:
353-420`) — the reference delegates pixels to Ray Data image readers.
"""

from __future__ import annotations

import math

# zigzag index k -> natural (row-major) coefficient index, derived from
# the diagonal walk rather than a hand-typed table
def _zigzag_order() -> list:
    order, x, y = [], 0, 0
    for _ in range(64):
        order.append(8 * y + x)
        if (x + y) % 2 == 0:  # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:  # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x -= 1
                y += 1
    return order


_ZZ = _zigzag_order()

# IDCT basis: cos((2x+1)uπ/16) with the C(u)=1/√2 DC normalization
# folded in; the 2-D transform separates into two 0.5-scaled passes
_COS = [
    [
        math.cos((2 * x + 1) * u * math.pi / 16)
        * (math.sqrt(0.5) if u == 0 else 1.0)
        for u in range(8)
    ]
    for x in range(8)
]


def _idct_block(coef: list) -> list:
    """64 natural-order dequantized coefficients -> 64 spatial samples
    (level-shifted +128, clamped to 0..255), row-major."""
    # rows: for each vertical freq v, transform across u -> R[v][x]
    rows = [
        [
            0.5
            * sum(_COS[x][u] * coef[8 * v + u] for u in range(8))
            for x in range(8)
        ]
        for v in range(8)
    ]
    out = [0] * 64
    for x in range(8):
        col = [rows[v][x] for v in range(8)]
        for y in range(8):
            s = 0.5 * sum(_COS[y][v] * col[v] for v in range(8))
            p = int(math.floor(s + 0.5)) + 128  # half-up, not banker's
            out[8 * y + x] = 0 if p < 0 else 255 if p > 255 else p
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; refuses to run past an un-stuffed marker."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0

    def bit(self) -> int:
        if self.cnt == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data ran out")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy-coded data")
            self.buf = b
            self.cnt = 8
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.cnt = 0


def _build_huff(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman (T.81 C.2): {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc", "ac", "pred", "plane", "pw", "ph")


def decode_jpeg_pixels(payload: bytes) -> "tuple[int, int, int, bytes]":
    """Decode a baseline JPEG to ``(width, height, channels, pixels)``
    — interleaved row-major bytes, grayscale (1) or RGB (3)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    qt: dict[int, list] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[_Component] = []
    width = height = None
    restart_interval = 0
    i, n = 2, len(payload)
    while True:
        if i + 1 >= n:
            raise ValueError("truncated JPEG (no SOS)")
        if payload[i] != 0xFF:
            raise ValueError("lost marker sync")
        while i < n and payload[i] == 0xFF:
            i += 1
        marker = payload[i]
        i += 1
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        seg_len = int.from_bytes(payload[i : i + 2], "big")
        data = payload[i + 2 : i + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(data):
                pq, tq_id = data[j] >> 4, data[j] & 15
                j += 1
                if pq == 0:
                    tbl = list(data[j : j + 64])
                    j += 64
                else:
                    tbl = [
                        int.from_bytes(data[j + 2 * t : j + 2 * t + 2], "big")
                        for t in range(64)
                    ]
                    j += 128
                qt[tq_id] = tbl  # zigzag order, as stored
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1: baseline family
            if data[0] != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            height = int.from_bytes(data[1:3], "big")
            width = int.from_bytes(data[3:5], "big")
            ncomp = data[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG (CMYK?) not supported"
                )
            for k in range(ncomp):
                c = _Component()
                c.cid = data[6 + 3 * k]
                c.h = data[7 + 3 * k] >> 4
                c.v = data[7 + 3 * k] & 15
                c.tq = data[8 + 3 * k]
                c.pred = 0
                comps.append(c)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) needs libjpeg — only baseline decodes "
                "stdlib-side"
            )
        elif marker == 0xC4:  # DHT — possibly several tables
            j = 0
            while j < len(data):
                cls, tid = data[j] >> 4, data[j] & 15
                counts = data[j + 1 : j + 17]
                nsym = sum(counts)
                symbols = data[j + 17 : j + 17 + nsym]
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_huff(
                    counts, symbols
                )
                j += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(data[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if width is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            scan = []
            for k in range(ns):
                cid = data[1 + 2 * k]
                td, ta = data[2 + 2 * k] >> 4, data[2 + 2 * k] & 15
                comp = next(c for c in comps if c.cid == cid)
                comp.dc = huff_dc[td]
                comp.ac = huff_ac[ta]
                scan.append(comp)
            if len(scan) != len(comps):
                raise NotImplementedError("non-interleaved JPEG scans")
            i += seg_len
            break
        i += seg_len

    max_h = max(c.h for c in comps)
    max_v = max(c.v for c in comps)
    mcux = (width + 8 * max_h - 1) // (8 * max_h)
    mcuy = (height + 8 * max_v - 1) // (8 * max_v)
    for c in comps:
        c.pw = mcux * c.h * 8
        c.ph = mcuy * c.v * 8
        c.plane = bytearray(c.pw * c.ph)

    br = _BitReader(payload, i)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                # byte-align, consume RSTn, reset DC predictors
                br.align()
                p = br.pos
                if payload[p] != 0xFF or not (
                    0xD0 <= payload[p + 1] <= 0xD7
                ):
                    raise ValueError("expected restart marker")
                br.pos = p + 2
                for c in comps:
                    c.pred = 0
            mcu_count += 1
            for c in comps:
                q = qt[c.tq]
                for by in range(c.v):
                    for bx in range(c.h):
                        coef = [0] * 64
                        t = _decode_huff(br, c.dc)
                        diff = _extend(br.bits(t), t)
                        c.pred += diff
                        coef[0] = c.pred * q[0]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, c.ac)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL: 16 zeros
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[_ZZ[k]] = _extend(br.bits(s), s) * q[k]
                            k += 1
                        block = _idct_block(coef)
                        x0 = (mx * c.h + bx) * 8
                        y0 = (my * c.v + by) * 8
                        for yy in range(8):
                            row = (y0 + yy) * c.pw + x0
                            c.plane[row : row + 8] = bytes(
                                block[8 * yy : 8 * yy + 8]
                            )

    if len(comps) == 1:
        c = comps[0]
        out = bytearray(width * height)
        for y in range(height):
            out[y * width : (y + 1) * width] = c.plane[
                y * c.pw : y * c.pw + width
            ]
        return width, height, 1, bytes(out)
    # YCbCr -> RGB with nearest-neighbor chroma upsampling
    cy, cb, cr = comps
    out = bytearray(width * height * 3)
    for y in range(height):
        ys = [
            (y * c.v // max_v) * c.pw for c in comps
        ]  # per-comp row offsets
        for x in range(width):
            Y = cy.plane[ys[0] + (x * cy.h // max_h)]
            Cb = cb.plane[ys[1] + (x * cb.h // max_h)] - 128
            Cr = cr.plane[ys[2] + (x * cr.h // max_h)] - 128
            r = int(math.floor(Y + 1.402 * Cr + 0.5))
            g = int(math.floor(Y - 0.344136 * Cb - 0.714136 * Cr + 0.5))
            b = int(math.floor(Y + 1.772 * Cb + 0.5))
            o = 3 * (y * width + x)
            out[o] = 0 if r < 0 else 255 if r > 255 else r
            out[o + 1] = 0 if g < 0 else 255 if g > 255 else g
            out[o + 2] = 0 if b < 0 else 255 if b > 255 else b
    return width, height, 3, bytes(out)
