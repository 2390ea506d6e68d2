"""JPEG pixel decode with the stdlib alone (ITU T.81 DCT, Huffman
entropy coding): segment parse → Huffman block decode → dequantize →
separable float IDCT → chroma upsample → YCbCr→RGB.

Supports what training corpora overwhelmingly carry: 8-bit baseline
(SOF0), extended-sequential (SOF1) AND progressive (SOF2 — spectral
selection + successive approximation per T.81 Annex G: DC first/refine
scans, AC first scans with EOB runs, AC refinement scans with
correction bits) in grayscale and 3-component YCbCr with any h×v
sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart markers,
multi-table DQT/DHT. Arithmetic coding, 12-bit precision and
hierarchical modes raise NotImplementedError — a real cluster wires
libjpeg-turbo for those.

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
    __slots__ = (
        "cid", "h", "v", "tq", "dc", "ac", "pred", "plane", "pw", "ph",
        # progressive: raw coefficient grid (padded MCU geometry) and
        # block counts — bw/bh padded, uw/uh actually-used
        "coefs", "bw", "bh", "uw", "uh",
    )


def _parse_dqt(data: bytes, qt: dict) -> None:
    """DQT segment — possibly several tables per segment (zigzag
    order, as stored)."""
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
        qt[tq_id] = tbl


def _parse_dht(data: bytes, huff_dc: dict, huff_ac: dict) -> None:
    """DHT segment — possibly several tables per segment."""
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


def _to_pixels(
    comps: list, width: int, height: int, max_h: int, max_v: int
) -> "tuple[int, int, int, bytes]":
    """Assemble decoded component planes into interleaved pixels —
    grayscale passthrough or YCbCr→RGB with nearest-neighbor chroma
    upsampling. Shared by the baseline and progressive paths."""
    if len(comps) == 1:
        c = comps[0]
        out = bytearray(width * height)
        for y in range(height):
            out[y * width : (y + 1) * width] = c.plane[
                y * c.pw : y * c.pw + width
            ]
        return width, height, 1, bytes(out)
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
        if marker == 0xDB:  # DQT
            _parse_dqt(data, qt)
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
        elif marker == 0xC2:  # SOF2: progressive DCT, Huffman
            return _decode_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/hierarchical/"
                "lossless) needs libjpeg — baseline and progressive "
                "decode stdlib-side"
            )
        elif marker == 0xC4:  # DHT
            _parse_dht(data, huff_dc, huff_ac)
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

    return _to_pixels(comps, width, height, max_h, max_v)


# ---------------------------------------------------------------------------
# progressive DCT (T.81 Annex G, Huffman)
# ---------------------------------------------------------------------------


def _ac_first(br, actab, coef, ss, se, al, eobrun):
    """AC spectral-selection first scan (G.1.2.2): band [ss..se] with
    EOB runs; coefficients land pre-shifted by the approximation low
    bit (<< al)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, actab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1  # this block ends now
                if r:
                    eobrun += br.bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        coef[_ZZ[k]] = _extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, actab, coef, ss, se, al, eobrun):
    """AC successive-approximation refinement scan (G.1.2.3):
    correction bits for already-nonzero coefficients, newly-significant
    coefficients at ±(1<<al), EOB runs refine the band remainder."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, actab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: run of 16 zero-history coefficients
            else:
                # s must be 1 in a refinement scan
                val = p1 if br.bit() else m1
            while k <= se:
                idx = _ZZ[k]
                if coef[idx] != 0:
                    if br.bit() and (coef[idx] & p1) == 0:
                        coef[idx] += p1 if coef[idx] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[_ZZ[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            idx = _ZZ[k]
            if coef[idx] != 0:
                if br.bit() and (coef[idx] & p1) == 0:
                    coef[idx] += p1 if coef[idx] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _eat_restart(br, payload):
    br.align()
    p = br.pos
    if payload[p] != 0xFF or not (0xD0 <= payload[p + 1] <= 0xD7):
        raise ValueError("expected restart marker")
    br.pos = p + 2


def _decode_progressive(payload: bytes) -> "tuple[int, int, int, bytes]":
    """Progressive JPEG → pixels. Coefficients accumulate across scans
    (DC first/refine interleaved over MCUs; AC first/refine
    non-interleaved per component); dequantize + IDCT once at EOI."""
    qt: dict[int, list] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[_Component] = []
    width = height = None
    max_h = max_v = 1
    mcux = mcuy = 0
    restart_interval = 0
    i, n = 2, len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            raise ValueError("lost marker sync")
        while i < n and payload[i] == 0xFF:
            i += 1
        marker = payload[i]
        i += 1
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(payload[i : i + 2], "big")
        data = payload[i + 2 : i + seg_len]
        if marker == 0xDB:
            _parse_dqt(data, qt)
        elif marker == 0xC4:
            _parse_dht(data, huff_dc, huff_ac)
        elif marker == 0xDD:
            restart_interval = int.from_bytes(data[:2], "big")
        elif marker == 0xC2:
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
            max_h = max(c.h for c in comps)
            max_v = max(c.v for c in comps)
            mcux = (width + 8 * max_h - 1) // (8 * max_h)
            mcuy = (height + 8 * max_v - 1) // (8 * max_v)
            for c in comps:
                c.bw = mcux * c.h
                c.bh = mcuy * c.v
                # used block counts (T.81 A.2.4 non-interleaved
                # geometry): ceil of the component's sample dimensions
                c.uw = (-(-width * c.h // max_h) + 7) // 8
                c.uh = (-(-height * c.v // max_v) + 7) // 8
                c.coefs = [[0] * 64 for _ in range(c.bw * c.bh)]
        elif marker == 0xDA:  # SOS: one progressive scan
            if width is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            scan = []
            for k in range(ns):
                cid = data[1 + 2 * k]
                td, ta = data[2 + 2 * k] >> 4, data[2 + 2 * k] & 15
                comp = next(c for c in comps if c.cid == cid)
                comp.dc = huff_dc.get(td)
                comp.ac = huff_ac.get(ta)
                scan.append(comp)
            ss = data[1 + 2 * ns]
            se = data[2 + 2 * ns]
            ah = data[3 + 2 * ns] >> 4
            al = data[3 + 2 * ns] & 15
            br = _BitReader(payload, i + seg_len)
            if ss == 0:  # DC scan
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                for c in scan:
                    c.pred = 0
                if len(scan) > 1:  # interleaved over MCUs
                    count = 0
                    for my in range(mcuy):
                        for mx in range(mcux):
                            if (
                                restart_interval
                                and count
                                and count % restart_interval == 0
                            ):
                                _eat_restart(br, payload)
                                for c in scan:
                                    c.pred = 0
                            count += 1
                            for c in scan:
                                for by in range(c.v):
                                    for bx in range(c.h):
                                        coef = c.coefs[
                                            (my * c.v + by) * c.bw
                                            + (mx * c.h + bx)
                                        ]
                                        if ah == 0:
                                            t = _decode_huff(br, c.dc)
                                            c.pred += _extend(
                                                br.bits(t), t
                                            )
                                            coef[0] = c.pred << al
                                        elif br.bit():
                                            coef[0] |= 1 << al
                else:  # single-component DC scan: used-block geometry
                    c = scan[0]
                    count = 0
                    for by in range(c.uh):
                        for bx in range(c.uw):
                            if (
                                restart_interval
                                and count
                                and count % restart_interval == 0
                            ):
                                _eat_restart(br, payload)
                                c.pred = 0
                            count += 1
                            coef = c.coefs[by * c.bw + bx]
                            if ah == 0:
                                t = _decode_huff(br, c.dc)
                                c.pred += _extend(br.bits(t), t)
                                coef[0] = c.pred << al
                            elif br.bit():
                                coef[0] |= 1 << al
            else:  # AC scan — always single-component
                if len(scan) != 1:
                    raise ValueError("interleaved progressive AC scan")
                c = scan[0]
                eobrun = 0
                count = 0
                for by in range(c.uh):
                    for bx in range(c.uw):
                        if (
                            restart_interval
                            and count
                            and count % restart_interval == 0
                        ):
                            _eat_restart(br, payload)
                            eobrun = 0
                        count += 1
                        coef = c.coefs[by * c.bw + bx]
                        if ah == 0:
                            eobrun = _ac_first(
                                br, c.ac, coef, ss, se, al, eobrun
                            )
                        else:
                            eobrun = _ac_refine(
                                br, c.ac, coef, ss, se, al, eobrun
                            )
            br.align()
            i = br.pos
            continue
        i += seg_len

    if width is None:
        raise ValueError("no SOF2 frame found")
    # dequantize + IDCT every block, assemble planes
    for c in comps:
        q = qt[c.tq]
        c.pw = c.bw * 8
        c.ph = c.bh * 8
        c.plane = bytearray(c.pw * c.ph)
        for by in range(c.bh):
            for bx in range(c.bw):
                raw = c.coefs[by * c.bw + bx]
                dq = [0] * 64
                for k in range(64):
                    idx = _ZZ[k]
                    if raw[idx]:
                        dq[idx] = raw[idx] * q[k]
                block = _idct_block(dq)
                x0, y0 = bx * 8, by * 8
                for yy in range(8):
                    row = (y0 + yy) * c.pw + x0
                    c.plane[row : row + 8] = bytes(
                        block[8 * yy : 8 * yy + 8]
                    )
    return _to_pixels(comps, width, height, max_h, max_v)


# ---------------------------------------------------------------------------
# minimal baseline encoder (grayscale, unit quantization)
# ---------------------------------------------------------------------------

# fixed, trivially-valid canonical Huffman tables: 12 DC categories at
# 4 bits, all 256 AC (run,size) symbols at 9 bits. Poor compression,
# perfectly spec-legal (canonical, prefix-free, no all-ones code) —
# these streams decode in ANY baseline JPEG decoder.
_ENC_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_ENC_DC_SYMS = bytes(range(12))
_ENC_AC_COUNTS = bytes([0] * 8 + [255, 1] + [0] * 6)
_ENC_AC_SYMS = bytes(range(256))


def _enc_codes(counts: bytes, syms: bytes) -> dict:
    """symbol -> (code, length) for a canonical table (C.2)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


_ENC_DC = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMS)
_ENC_AC = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMS)


class _BitWriterE:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing (F.1.2.3)

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill
        return bytes(self.out)


def _fdct_block(samples: list) -> list:
    """Forward DCT (T.81 A.3.3), separable two-pass float, rounded to
    nearest int. A flat block short-circuits to its exact DC-only
    result (what makes flat-block images lossless through
    encode→decode at unit quantization)."""
    first = samples[0]
    if all(s == first for s in samples):
        out = [0] * 64
        out[0] = 8 * (first - 128)  # 0.25 * (1/√2)² * 64 * (v-128)
        return out
    shifted = [s - 128 for s in samples]
    # rows: R[y][u] = 0.5 * C(u) * Σx s(x,y) cos((2x+1)uπ/16)
    rows = [
        [
            0.5 * sum(_COS[x][u] * shifted[8 * y + x] for x in range(8))
            for u in range(8)
        ]
        for y in range(8)
    ]
    out = [0] * 64
    for u in range(8):
        col = [rows[y][u] for y in range(8)]
        for v in range(8):
            s = 0.5 * sum(_COS[y][v] * col[y] for y in range(8))
            out[8 * v + u] = int(math.floor(s + 0.5))
    return out


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Grayscale baseline JPEG at UNIT quantization (q=1 everywhere).

    General images round-trip with only FDCT rounding loss; images
    whose every 8x8 block is a single flat value round-trip
    LOSSLESSLY (DC-only blocks; DC IDCT is exact) — the property the
    codec oracle rows rely on, mirroring the dyadic-exact PNG/WAV
    rows. Dimensions must be multiples of 8."""
    if width % 8 or height % 8:
        raise ValueError("encode_jpeg_gray needs multiple-of-8 dims")
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT, all ones
    out += seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + _ENC_DC_COUNTS + _ENC_DC_SYMS)
    out += seg(0xC4, bytes([0x10]) + _ENC_AC_COUNTS + _ENC_AC_SYMS)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriterE()
    pred = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            block = [
                pixels[(by * 8 + y) * width + bx * 8 + x]
                for y in range(8)
                for x in range(8)
            ]
            coef = _fdct_block(block)
            diff = coef[0] - pred
            pred = coef[0]
            t = 0 if diff == 0 else abs(diff).bit_length()
            code, ln = _ENC_DC[t]
            bw.put(code, ln)
            if t:
                bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
            run = 0
            for k in range(1, 64):
                v = coef[_ZZ[k]]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _ENC_AC[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                code, ln = _ENC_AC[(run << 4) | s]
                bw.put(code, ln)
                bw.put(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                code, ln = _ENC_AC[0x00]  # EOB
                bw.put(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray_progressive(
    width: int, height: int, pixels: bytes
) -> bytes:
    """Grayscale PROGRESSIVE JPEG (SOF2, T.81 Annex G) at unit
    quantization — four scans exercising the successive-approximation
    and spectral-selection decode paths end to end:

    1. DC first  (Ss=0 Se=0 Ah=0 Al=1): DC diffs on point-transformed
       values (arithmetic shift right by 1);
    2. DC refine (Ah=1 Al=0): one raw bit per block;
    3. AC first band 1..5  (Al=0) with EOB-run coding (EOBn symbols +
       extension bits);
    4. AC first band 6..63 (Al=0), same coding.

    Same exactness property as `encode_jpeg_gray`: blockwise-flat
    images round-trip LOSSLESSLY (all-zero AC → the AC scans are pure
    EOB runs; the DC point transform's dropped bit returns in the
    refinement scan). Dimensions must be multiples of 8."""
    if width % 8 or height % 8:
        raise ValueError("encode_jpeg_gray_progressive needs multiple-of-8 dims")
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    blocks = []
    for by in range(height // 8):
        for bx in range(width // 8):
            blocks.append(
                _fdct_block(
                    [
                        pixels[(by * 8 + y) * width + bx * 8 + x]
                        for y in range(8)
                        for x in range(8)
                    ]
                )
            )

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(
        0xC2,  # SOF2: progressive DCT
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + _ENC_DC_COUNTS + _ENC_DC_SYMS)
    out += seg(0xC4, bytes([0x10]) + _ENC_AC_COUNTS + _ENC_AC_SYMS)

    # scan 1: DC first, successive approximation high bits (Al=1)
    bw = _BitWriterE()
    pred = 0
    for coef in blocks:
        v = coef[0] >> 1  # G.1.2.1: arithmetic shift right
        diff = v - pred
        pred = v
        t = 0 if diff == 0 else abs(diff).bit_length()
        code, ln = _ENC_DC[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bw.flush()

    # scan 2: DC refinement (Ah=1, Al=0) — one raw bit per block
    bw = _BitWriterE()
    for coef in blocks:
        bw.put(coef[0] & 1, 1)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bw.flush()

    # scans 3+4: AC first per spectral band, EOB-run coded (G.1.2.2)
    for ss, se in ((1, 5), (6, 63)):
        bw = _BitWriterE()
        eobrun = 0

        def _flush_eobrun():
            nonlocal eobrun
            while eobrun:
                r = min(eobrun.bit_length() - 1, 14)
                code, ln = _ENC_AC[r << 4]
                bw.put(code, ln)
                if r:
                    bw.put(eobrun - (1 << r), r)
                eobrun -= 1 << r

        for coef in blocks:
            nz = [
                (k, coef[_ZZ[k]])
                for k in range(ss, se + 1)
                if coef[_ZZ[k]]
            ]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    _flush_eobrun()
                continue
            _flush_eobrun()
            run = 0
            prev = ss - 1
            for k, v in nz:
                run = k - prev - 1
                prev = k
                while run > 15:
                    code, ln = _ENC_AC[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                code, ln = _ENC_AC[(run << 4) | s]
                bw.put(code, ln)
                bw.put(v if v > 0 else v + (1 << s) - 1, s)
            if prev < se:
                eobrun += 1  # this block's EOB joins the next run
        _flush_eobrun()
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, 0x00])) + bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MJPEG frame streams (concatenated JPEG frames)
# ---------------------------------------------------------------------------


def encode_mjpeg(frames: "list[bytes]") -> bytes:
    """Concatenated-JPEG motion stream — the payload shape of MJPEG
    over HTTP (multipart) and of MJPEG AVI chunks."""
    for f in frames:
        if f[:2] != b"\xff\xd8" or f[-2:] != b"\xff\xd9":
            raise ValueError("every MJPEG frame must be SOI..EOI")
    return b"".join(frames)


def _frame_end(payload: bytes, soi: int) -> int:
    """Index just past the EOI of the JPEG frame starting at `soi`,
    found by WALKING the segment grammar (framed segments skip their
    declared length, entropy data skips via stuffing/RST rules) — so a
    literal FFD9 inside an APPn/EXIF payload never truncates the
    frame."""
    n = len(payload)
    i = soi + 2
    while i + 1 < n:
        if payload[i] != 0xFF:
            raise ValueError("lost marker sync in MJPEG frame")
        while i < n and payload[i] == 0xFF:
            i += 1
        marker = payload[i]
        i += 1
        if marker == 0xD9:  # EOI
            return i
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue  # standalone markers
        seg_len = int.from_bytes(payload[i : i + 2], "big")
        i += seg_len
        if marker == 0xDA:  # SOS: skip entropy until a real marker
            while i + 1 < n:
                if payload[i] != 0xFF:
                    i += 1
                elif payload[i + 1] == 0x00 or 0xD0 <= payload[i + 1] <= 0xD7:
                    i += 2  # stuffed byte / restart marker
                else:
                    break
    raise ValueError("truncated MJPEG frame (no EOI)")


def split_mjpeg_frames(payload: bytes) -> "list[bytes]":
    """Split a concatenated-JPEG stream into frames by walking each
    frame's segment grammar to its EOI (robust to FFD9 bytes inside
    APPn/EXIF payloads, which a naive marker scan would split on)."""
    frames = []
    i = 0
    n = len(payload)
    while i < n:
        soi = payload.find(b"\xff\xd8", i)
        if soi < 0:
            break
        end = _frame_end(payload, soi)
        frames.append(payload[soi:end])
        i = end
    if not frames:
        raise ValueError("no JPEG frames in MJPEG payload")
    return frames
