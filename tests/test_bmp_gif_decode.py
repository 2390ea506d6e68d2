"""Stdlib BMP/GIF pixel decode (`sources/images.py`): hand-built byte
streams with known pixels — BMP row padding/BGR order/bottom-up vs
top-down/palette, GIF LZW (including the variable code-width growth a
literal-only stream still triggers), interlace row order, transparency,
and frame placement on the logical screen."""

import pytest

from deltacat_spark.sources.images import (
    _lzw_decode,
    decode_bmp_pixels,
    decode_gif_pixels,
)

# ---- BMP writer ------------------------------------------------------


def _bmp(w, h, rows_rgb, bpp=24, top_down=False, palette=None):
    """rows_rgb: h rows of w (r,g,b[,a]) tuples, TOP-DOWN logical order."""
    hdr_h = h if top_down else -h if False else h
    height = -h if top_down else h
    pal = b""
    if bpp == 8:
        pal = b"".join(
            bytes([b, g, r, 0]) for (r, g, b) in palette
        )
    data_off = 14 + 40 + len(pal)
    px = bytearray()
    stride_src = rows_rgb if top_down else rows_rgb[::-1]
    for row in stride_src:
        line = bytearray()
        for t in row:
            if bpp == 24:
                r, g, b = t
                line += bytes([b, g, r])
            elif bpp == 32:
                r, g, b, a = t
                line += bytes([b, g, r, a])
            else:  # palette index
                line += bytes([t])
        while len(line) % 4:
            line += b"\x00"
        px += line
    body = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(px).to_bytes(4, "little")
        + (0).to_bytes(16, "little")  # ppm + colors used/important
    )
    if bpp == 8:
        body = body[:-16] + (0).to_bytes(8, "little") + len(palette).to_bytes(
            4, "little"
        ) + (0).to_bytes(4, "little")
    head = b"BM" + (data_off + len(px)).to_bytes(4, "little") + b"\x00" * 4
    return head + data_off.to_bytes(4, "little") + body + pal + bytes(px)


def test_bmp_24bit_bottom_up_with_padding():
    rows = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
            [(1, 2, 3), (4, 5, 6), (7, 8, 9)]]
    w, h, ch, px = decode_bmp_pixels(_bmp(3, 2, rows))
    assert (w, h, ch) == (3, 2, 3)
    got = [tuple(px[3 * i : 3 * i + 3]) for i in range(6)]
    assert got == [t for row in rows for t in row]


def test_bmp_top_down_and_32bit():
    rows = [[(10, 20, 30, 40), (50, 60, 70, 80)]]
    w, h, ch, px = decode_bmp_pixels(
        _bmp(2, 1, rows, bpp=32, top_down=True)
    )
    assert (w, h, ch) == (2, 1, 4)
    assert tuple(px[:4]) == (10, 20, 30, 40)
    assert tuple(px[4:]) == (50, 60, 70, 80)


def test_bmp_8bit_palette():
    palette = [(255, 0, 0), (0, 255, 0)]
    rows = [[0, 1], [1, 0]]
    w, h, ch, px = decode_bmp_pixels(_bmp(2, 2, rows, bpp=8, palette=palette))
    got = [tuple(px[3 * i : 3 * i + 3]) for i in range(4)]
    assert got == [(255, 0, 0), (0, 255, 0), (0, 255, 0), (255, 0, 0)]


def test_bmp_refusals():
    with pytest.raises(ValueError):
        decode_bmp_pixels(b"XX")
    rle = bytearray(_bmp(2, 1, [[(1, 2, 3), (4, 5, 6)]]))
    rle[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp_pixels(bytes(rle))


# ---- GIF writer ------------------------------------------------------


def _lzw_literals(min_code_size, indices):
    """Literal-only LZW stream that still tracks the decoder's table
    growth (each emitted code after the first adds a table entry, and
    the code width grows when the table fills the current width)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    table_len = clear + 2
    bits = []
    prev = False

    def emit(c):
        for k in range(width):  # LSB first
            bits.append((c >> k) & 1)

    emit(clear)
    for c in indices:
        emit(c)
        if prev:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
        prev = True
    emit(end)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        out.append(b)
    return bytes(out)


def _gif(sw, sh, indices, palette, iw=None, ih=None, ix=0, iy=0,
         interlaced=False, transparent=None, min_code_size=2):
    iw = iw or sw
    ih = ih or sh
    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1) if n > 2 else 0
    table_n = 2 << size_field
    gct = b"".join(bytes(c) for c in palette) + b"\x00" * (
        3 * (table_n - n)
    )
    out = b"GIF89a" + sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | size_field, 0, 0]) + gct
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += b"\x2c" + ix.to_bytes(2, "little") + iy.to_bytes(2, "little")
    out += iw.to_bytes(2, "little") + ih.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0])
    lzw = _lzw_literals(min_code_size, indices)
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00\x3b"


PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]


def test_gif_2x2_rgb():
    w, h, ch, px = decode_gif_pixels(_gif(2, 2, [0, 1, 2, 3], PAL4))
    assert (w, h, ch) == (2, 2, 3)
    got = [tuple(px[3 * i : 3 * i + 3]) for i in range(4)]
    assert got == PAL4


def test_gif_code_width_growth():
    # 33 pixels: the literal stream crosses the width-3 -> width-4
    # table boundary mid-stream (decoder adds an entry per code)
    idx = [i % 4 for i in range(33)]
    w, h, ch, px = decode_gif_pixels(_gif(33, 1, idx, PAL4))
    got = [tuple(px[3 * i : 3 * i + 3]) for i in range(33)]
    assert got == [PAL4[i] for i in idx]


def test_gif_lzw_compressed_codes():
    # Real LZW back-references, hand-traced (min_code_size=2, clear=4,
    # end=5, width starts 3):
    #   4(clear) -> reset
    #   0 -> out "0"                         (prev None, no append)
    #   1 -> out "1";  table[6]="01"         (len 7)
    #   6 -> out "01"; table[7]="10"         (len 8 = 2^3 -> width 4)
    #   8 -> code==len(table): entry=prev+prev[0]="010"; out "010"
    #   5(end)
    # output = 0 1 0 1 0 1 0  (7 pixels)
    bits = []

    def emit(c, wd):
        for k in range(wd):
            bits.append((c >> k) & 1)

    for c in (4, 0, 1, 6):
        emit(c, 3)
    emit(8, 4)  # width grew after code 6 filled the 3-bit table
    emit(5, 4)
    raw = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        raw.append(b)
    out = _lzw_decode(2, bytes(raw), 7)
    assert list(out) == [0, 1, 0, 1, 0, 1, 0]


def test_gif_interlaced_rows():
    # 1x8 columns, interlaced: storage order is rows 0,4,2,6,1,3,5,7 of
    # the logical image — give storage pixels 0..7 and expect the
    # deinterlaced row order
    idx = [0, 1, 2, 3, 0, 1, 2, 3]
    w, h, ch, px = decode_gif_pixels(
        _gif(1, 8, idx, PAL4, interlaced=True)
    )
    # storage row s lands at logical row [0,4,2,6,1,3,5,7][s]
    logical = [None] * 8
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    for s, dst in enumerate(order):
        logical[dst] = PAL4[idx[s]]
    got = [tuple(px[3 * i : 3 * i + 3]) for i in range(8)]
    assert got == logical


def test_gif_transparency_rgba():
    w, h, ch, px = decode_gif_pixels(
        _gif(2, 1, [0, 1], PAL4, transparent=1)
    )
    assert ch == 4
    assert tuple(px[:4]) == (255, 0, 0, 255)
    assert px[7] == 0  # transparent pixel's alpha


def test_gif_frame_offset_on_screen():
    # 1x1 frame at (1, 1) of a 3x2 screen: uncovered screen is zeroed
    w, h, ch, px = decode_gif_pixels(
        _gif(3, 2, [2], PAL4, iw=1, ih=1, ix=1, iy=1)
    )
    assert (w, h) == (3, 2)
    assert tuple(px[3 * 4 : 3 * 4 + 3]) == (0, 0, 255)  # (1,1)
    assert tuple(px[:3]) == (0, 0, 0)


def test_gif_refusals():
    with pytest.raises(ValueError):
        decode_gif_pixels(b"GIF10")
    with pytest.raises(ValueError):
        decode_gif_pixels(b"GIF89a" + b"\x00" * 7)  # no frame
