"""Progressive JPEG decode (`sources/jpeg.py::_decode_progressive` —
T.81 Annex G spectral selection + successive approximation).

Fixtures under tests/data/ were written by JDK ImageIO's JPEG encoder
(progressive mode — a libjpeg-derived scan script with DC first/refine,
banded AC first, and AC refinement scans) together with REFERENCE
pixels from ImageIO decoding its own bytes. The gray-content RGB
fixture keeps Cb/Cr constant, so chroma-upsampling differences vanish
and any pixel diff isolates the Y coefficient path: the decoder must
match libjpeg to ±1 (IDCT rounding).

Note on the flat gray fixture: Java encodes TYPE_BYTE_GRAY through a
linear color space (sRGB 128 → linear ≈ 55), so the STREAM genuinely
carries 55 — asserting uniform 55 pins single-component progressive
decode without depending on Java's inverse transform.
"""

import os
import struct

from deltacat_spark.sources.jpeg import decode_jpeg_pixels

DATA = os.path.join(os.path.dirname(__file__), "data")


def _load(name):
    jpg = open(os.path.join(DATA, name), "rb").read()
    assert bytes([0xFF, 0xC2]) in jpg  # really progressive
    return jpg


def _load_ref(name):
    ref = open(os.path.join(DATA, name + ".ref"), "rb").read()
    w, h = struct.unpack(">ii", ref[:8])
    return w, h, ref[8:]


def test_progressive_y_path_matches_libjpeg_within_rounding():
    jpg = _load("prog_graycontent.jpg")
    rw, rh, refpix = _load_ref("prog_graycontent.jpg")
    w, h, ch, pix = decode_jpeg_pixels(jpg)
    assert (w, h, ch) == (rw, rh, 3)
    diffs = [abs(a - b) for a, b in zip(pix, refpix)]
    assert max(diffs) <= 1
    assert sum(diffs) / len(diffs) < 0.05


def test_progressive_420_subsampled_color():
    """4:2:0 progressive color: this repo upsamples chroma
    nearest-neighbor while libjpeg uses a triangle filter, so chroma
    edges legitimately differ — bound the luma-dominated error loosely
    and pin dims/channels exactly."""
    jpg = _load("prog_color.jpg")
    rw, rh, refpix = _load_ref("prog_color.jpg")
    w, h, ch, pix = decode_jpeg_pixels(jpg)
    assert (w, h, ch) == (rw, rh, 3)
    diffs = [abs(a - b) for a, b in zip(pix, refpix)]
    assert sum(diffs) / len(diffs) < 10.0


def test_progressive_single_component_real_file():
    jpg = _load("flat128.jpg")
    w, h, ch, pix = decode_jpeg_pixels(jpg)
    assert (w, h, ch) == (32, 32, 1)
    assert all(abs(p - 55) <= 1 for p in pix)  # Java linear-gray 128


def test_progressive_equals_baseline_on_same_coefficients():
    """Hand-built minimal progressive stream (DC scan + full-band AC
    scan, no successive approximation) must decode pixel-identical to
    the BASELINE stream carrying the same coefficient blocks."""
    from tests.test_jpeg_decode import (
        _AC_CODE,
        _BitWriter,
        _dht,
        _dqt,
        _gray_jpeg,
        _seg,
        _sof,
    )

    blocks = [(16, {1: 1}), (4, None), (-8, {1: -1, 2: 1}), (0, None)]
    base = decode_jpeg_pixels(_gray_jpeg(16, 16, blocks))

    # DC-only scan: category+magnitude per block (Ss=Se=0, Ah=Al=0).
    # The shared helper's block values ARE the DC diffs.
    from tests.test_jpeg_decode import _DC_CODE

    dcw = _BitWriter()
    for diff, _ in blocks:
        t = 0 if diff == 0 else abs(diff).bit_length()
        dcw.put(*reversed(_DC_CODE[t]))
        if t:
            mag = diff if diff > 0 else diff + (1 << t) - 1
            dcw.put(mag, t)
    # AC scan (Ss=1, Se=63, Ah=Al=0): runs + EOB-run of 1 per block
    acw = _BitWriter()
    for _, ac in blocks:
        k = 1
        for kk in sorted((ac or {}).keys()):
            v = ac[kk]
            run = kk - k
            code = 0x01 if run == 0 else 0x11
            acw.put(*reversed(_AC_CODE[code]))
            acw.put(1 if v > 0 else 0, 1)
            k = kk + 1
        acw.put(*reversed(_AC_CODE[0x00]))  # EOB -> eobrun = 1

    def sos(ss, se):
        return _seg(0xDA, bytes([1, 1, 0x00, ss, se, 0x00]))

    prog = (
        b"\xff\xd8"
        + _dqt()
        + _sof(16, 16, [(1, 1, 1, 0)], marker=0xC2)
        + _dht()
        + sos(0, 0)
        + dcw.payload()
        + sos(1, 63)
        + acw.payload()
        + b"\xff\xd9"
    )
    assert decode_jpeg_pixels(prog) == base


# ---------------------------------------------------------------------------
# r12: the progressive ENCODER (encode_jpeg_gray_progressive)
# ---------------------------------------------------------------------------


def test_progressive_encoder_flat_blocks_lossless():
    import random

    from deltacat_spark.sources.jpeg import encode_jpeg_gray_progressive

    rng = random.Random(3)
    for _ in range(15):
        w, h = rng.choice([(8, 8), (16, 16), (32, 16), (64, 64)])
        vals = [rng.randrange(256) for _ in range((w // 8) * (h // 8))]
        px = bytes(
            vals[(y // 8) * (w // 8) + (x // 8)]
            for y in range(h)
            for x in range(w)
        )
        data = encode_jpeg_gray_progressive(w, h, px)
        assert bytes([0xFF, 0xC2]) in data  # SOF2
        assert data.count(b"\xff\xda") >= 4  # four scans
        assert decode_jpeg_pixels(data) == (w, h, 1, px)


def test_progressive_encoder_matches_baseline_within_rounding():
    import random

    from deltacat_spark.sources.jpeg import (
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    rng = random.Random(17)
    for _ in range(8):
        w, h = 16, 16
        px = bytes(rng.randrange(256) for _ in range(w * h))
        base = decode_jpeg_pixels(encode_jpeg_gray(w, h, px))[3]
        prog = decode_jpeg_pixels(
            encode_jpeg_gray_progressive(w, h, px)
        )[3]
        assert max(abs(a - b) for a, b in zip(base, prog)) <= 1


def test_progressive_encoder_external_decoder_agrees(tmp_path):
    """JDK ImageIO (libjpeg-derived) decodes our progressive streams —
    an external check that the SOF2/scan headers, EOB-run coding, and
    successive-approximation bits are spec-legal, not just
    self-consistent."""
    import random
    import shutil
    import subprocess

    import pytest

    if shutil.which("java") is None or shutil.which("javac") is None:
        pytest.skip("no JDK in environment")
    from deltacat_spark.sources.jpeg import encode_jpeg_gray_progressive

    src = tmp_path / "DecodeGray.java"
    src.write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.File;
import java.io.FileOutputStream;
public class DecodeGray {
    public static void main(String[] args) throws Exception {
        BufferedImage img = ImageIO.read(new File(args[0]));
        Raster r = img.getRaster();
        int w = img.getWidth(), h = img.getHeight();
        byte[] out = new byte[w * h];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                out[y * w + x] = (byte) r.getSample(x, y, 0);
        try (FileOutputStream f = new FileOutputStream(args[1])) {
            f.write(out);
        }
    }
}
"""
    )
    subprocess.run(
        ["javac", str(src)], check=True, capture_output=True
    )
    rng = random.Random(11)
    for trial in range(3):
        w, h = 32, 16
        vals = [rng.randrange(256) for _ in range((w // 8) * (h // 8))]
        px = bytes(
            vals[(y // 8) * (w // 8) + (x // 8)]
            for y in range(h)
            for x in range(w)
        )
        jpg = tmp_path / f"t{trial}.jpg"
        raw = tmp_path / f"t{trial}.raw"
        jpg.write_bytes(encode_jpeg_gray_progressive(w, h, px))
        subprocess.run(
            [
                "java",
                "-cp",
                str(tmp_path),
                "DecodeGray",
                str(jpg),
                str(raw),
            ],
            check=True,
            capture_output=True,
        )
        got = raw.read_bytes()
        assert max(abs(a - b) for a, b in zip(got, px)) <= 1
