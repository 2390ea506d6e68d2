"""Stdlib BMP and GIF pixel decode — the remaining raster formats a
training corpus carries that need no external library at all.

* BMP: BITMAPINFOHEADER / V4 / V5 uncompressed (BI_RGB) 24/32-bit
  BGR(A) rows and 8-bit palette images; bottom-up or top-down.
* GIF: GIF87a/89a, LZW-decompressed first frame, global or local color
  table, interlaced or sequential row order, transparency index via
  GCE (expands to RGBA).

Like the PNG/JPEG decoders these run inside `mapInPandas` executors —
per-pixel Python parallelizes with partitions. Reference capability
parity: image datasets (`deltacat/types/media.py:353-420`)."""

from __future__ import annotations


def decode_bmp_pixels(payload: bytes) -> "tuple[int, int, int, bytes]":
    """Decode an uncompressed BMP to (width, height, channels, pixels)
    — RGB (24/32-bit sources keep alpha → RGBA) row-major top-down."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr = int.from_bytes(payload[14:18], "little")
    if hdr < 40:
        raise NotImplementedError("OS/2 BITMAPCOREHEADER BMP")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp not in (0, 3) or w <= 0 or h == 0:
        raise NotImplementedError(f"BMP compression {comp}")
    top_down = h < 0
    h = abs(h)
    if bpp == 8:
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        pal_off = 14 + hdr
        pal = payload[pal_off : pal_off + 4 * n_colors]  # BGRA quads
        stride = (w + 3) & ~3
        out = bytearray(w * h * 3)
        for y in range(h):
            src_y = y if top_down else h - 1 - y
            row = data_off + src_y * stride
            for x in range(w):
                idx = payload[row + x]
                o = 3 * (y * w + x)
                out[o] = pal[4 * idx + 2]
                out[o + 1] = pal[4 * idx + 1]
                out[o + 2] = pal[4 * idx]
        return w, h, 3, bytes(out)
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP")
    ch = 3 if bpp == 24 else 4
    stride = (w * (bpp // 8) + 3) & ~3
    out = bytearray(w * h * ch)
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        row = data_off + src_y * stride
        for x in range(w):
            p = row + x * (bpp // 8)
            o = ch * (y * w + x)
            out[o] = payload[p + 2]  # R (stored BGR)
            out[o + 1] = payload[p + 1]
            out[o + 2] = payload[p]
            if ch == 4:
                out[o + 3] = payload[p + 3]
    return w, h, ch, bytes(out)


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF variable-width LZW (LSB-first bit packing)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader state
    bitpos = 0

    def read_code(width: int) -> int:
        nonlocal bitpos
        byte = bitpos >> 3
        if byte >= len(data):
            raise ValueError("LZW data ran out")
        v = int.from_bytes(data[byte : byte + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    table: list = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    prev: "bytes | None" = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            reset()
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif_pixels(payload: bytes) -> "tuple[int, int, int, bytes]":
    """Decode the FIRST frame of a GIF to (width, height, channels,
    pixels) — RGB, or RGBA when the frame declares a transparent
    index."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = payload[i : i + 3 * n]
        i += 3 * n
    transparent = None
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension
            label = payload[i + 1]
            i += 2
            if label == 0xF9:  # graphic control: transparency flag
                size = payload[i]
                if size >= 4 and payload[i + 1] & 1:
                    transparent = payload[i + 4]
            while payload[i]:  # skip sub-blocks
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            ix = int.from_bytes(payload[i + 1 : i + 3], "little")
            iy = int.from_bytes(payload[i + 3 : i + 5], "little")
            iw = int.from_bytes(payload[i + 5 : i + 7], "little")
            ih = int.from_bytes(payload[i + 7 : i + 9], "little")
            iflags = payload[i + 9]
            i += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = payload[i : i + 3 * n]
                i += 3 * n
            if ct is None:
                raise ValueError("GIF frame without a color table")
            interlaced = bool(iflags & 0x40)
            min_code = payload[i]
            i += 1
            lzw = bytearray()
            while payload[i]:
                size = payload[i]
                lzw += payload[i + 1 : i + 1 + size]
                i += 1 + size
            i += 1
            idx = _lzw_decode(min_code, bytes(lzw), iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("GIF frame shorter than its dimensions")
            if interlaced:
                rows = (
                    list(range(0, ih, 8))
                    + list(range(4, ih, 8))
                    + list(range(2, ih, 4))
                    + list(range(1, ih, 2))
                )
                de = bytearray(iw * ih)
                for src, dst in enumerate(rows):
                    de[dst * iw : (dst + 1) * iw] = idx[
                        src * iw : (src + 1) * iw
                    ]
                idx = de
            ch = 4 if transparent is not None else 3
            # compose the frame onto the logical screen (first frame:
            # uncovered screen area is index-0 / transparent-black)
            out = bytearray(sw * sh * ch)
            for y in range(ih):
                for x in range(iw):
                    px = idx[y * iw + x]
                    o = ch * ((iy + y) * sw + (ix + x))
                    out[o : o + 3] = ct[3 * px : 3 * px + 3]
                    if ch == 4:
                        out[o + 3] = 0 if px == transparent else 255
            return sw, sh, ch, bytes(out)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    raise ValueError("GIF with no image frame")


# ---------------------------------------------------------------------------
# PNG encode — the write half of the multimodal image path
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filters: "list[int] | int" = 0,
) -> bytes:
    """Interleaved 8-bit pixels → PNG bytes, stdlib-only (zlib IDAT +
    spec §9 scanline filters). `channels` 1/2/3/4 map to color types
    gray / gray+alpha / RGB / RGBA. `filters` is one filter type 0-4
    for every scanline or a per-row list — the encoder APPLIES the
    filter (sub/up/average/paeth deltas), so a decode round-trip
    exercises the matching unfilter path, not just type 0.

    The write half of the image surface: feature pipelines that emit
    thumbnails/crops as binary columns encode executor-side in the same
    `mapInPandas` batches the decoders run in."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"channels must be 1-4, got {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError(
            f"pixels length {len(pixels)} != h*w*ch {height * stride}"
        )
    row_filters = (
        [filters] * height if isinstance(filters, int) else list(filters)
    )
    if len(row_filters) != height:
        raise ValueError("need one filter type per scanline")
    bpp = channels
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = row_filters[y]
        if ft not in (0, 1, 2, 3, 4):
            raise ValueError(f"filter type {ft}")
        raw.append(ft)
        if ft == 0:
            raw.extend(row)
        elif ft == 1:  # Sub
            raw.extend(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw.extend((row[i] - prior[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw.extend(
                (
                    row[i]
                    - ((row[i - bpp] if i >= bpp else 0) + prior[i]) // 2
                )
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw.extend(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prior = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )
