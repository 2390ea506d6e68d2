"""Multimodal columns: binary payloads + typed metadata, processed with
Arrow-batched pandas transforms.

Reference surface: schemaless/multimodal tables (manifest reads,
`catalog/main/impl.py:1408-1439`) and media datastore types
(`types/media.py:353-420`). Beyond parity, this implements the
training-pipeline pattern: images/audio/video as opaque `binary` columns
with metadata, decoded/featurized inside `mapInPandas` (Arrow batches —
the only place Python touches the data plane).

PNG, baseline JPEG, GIF and BMP pixels decode for REAL with the stdlib
alone (`decode_png_pixels`: zlib IDAT inflate + per-scanline unfilter;
`sources/jpeg.py:decode_jpeg_pixels`: Huffman + IDCT + chroma upsample;
`sources/images.py`: GIF LZW + BMP). WAV audio decodes for real too
(`sources/audio.py`: RIFF parse + PCM samples + numpy features), MP4
containers probe for real (box walk → duration/dimensions), JPEG
decodes baseline AND progressive pixels (`sources/jpeg.py`), and
MJPEG video streams decode to real per-frame pixels
(`decode_mjpeg_frames` — concatenated-JPEG frame split + per-frame
decode). The remaining env-blocked stubs are compressed audio codecs
and inter-frame video codecs (H.264 etc.): those libraries are not in
this environment, so `decode=\"real\"` raises NotImplementedError for
such payloads while `decode=\"fake\"` derives deterministic
pseudo-metadata from the bytes. The Spark-side plumbing — schema,
batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("magic", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("digest", T.StringType()),
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"BM": "bmp",
    b"RIFF": "wav",
    b"\x00\x00\x00\x18": "mp4",
    b"\x00\x00\x00\x20": "mp4",
}


def binary_file_table(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque binary scan (`spark.read.format(\"binaryFile\")`): (path,
    modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _sniff_magic(payload: bytes) -> str:
    for sig, name in _MAGIC.items():
        if payload[: len(sig)] == sig:
            return name
    return "unknown"


# Start-of-frame markers carrying dimensions (JPEG/ITU T.81 §B.2.2):
# every 0xC0..0xCF frame header EXCEPT 0xC4 (DHT), 0xC8 (JPG ext) and
# 0xCC (DAC), which are table/extension segments with other payloads.
_JPEG_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)


def _jpeg_dims(payload: bytes) -> "tuple[int, int] | None":
    """Walk the JPEG segment stream to the first SOFn header and read
    (width, height) — byte arithmetic only, no imaging library.

    Segment grammar: 0xFF fill bytes, a marker code, then (for framed
    markers) a big-endian u16 length that INCLUDES its own two bytes.
    Standalone markers (SOI/EOI/TEM/RSTn) carry no length. The SOF
    payload is [len:2][precision:1][height:2][width:2]... Stops at SOS
    (entropy-coded data follows; a conforming stream's SOF precedes it)
    or any malformed structure — None, never garbage."""
    i, n = 2, len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            return None  # lost sync — corrupt stream
        while i < n and payload[i] == 0xFF:
            i += 1  # fill bytes before the marker code
        if i >= n:
            return None
        marker = payload[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone: SOI / TEM / RSTn
        if marker == 0xD9 or marker == 0xDA:
            return None  # EOI / SOS before any SOF
        if i + 2 > n:
            return None
        seg_len = int.from_bytes(payload[i : i + 2], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF_MARKERS:
            if i + 7 > n:
                return None
            h = int.from_bytes(payload[i + 3 : i + 5], "big")
            w = int.from_bytes(payload[i + 5 : i + 7], "big")
            return (w, h) if w > 0 and h > 0 else None
        i += seg_len
    return None


def parse_header_dims(payload: bytes) -> "tuple[int, int] | None":
    """REAL image dimensions from container headers by byte arithmetic
    alone — no imaging library needed, so this part of the decode path
    is NOT stubbed. Supports:

    * PNG: IHDR width/height, big-endian u32 at bytes 16..23;
    * GIF: logical-screen width/height, little-endian u16 at 6..9;
    * BMP: BITMAPINFOHEADER width/height, little-endian i32 at 18..25
      (height may be negative = top-down rows; abs() is the dimension);
    * JPEG: SOFn frame-header walk (`_jpeg_dims` — variable segment
      stream, still pure byte arithmetic).

    Returns None for anything else (pixel decode remains the PIL
    integration point, `decode="real"`).
    """
    if payload[:2] == b"\xff\xd8":
        return _jpeg_dims(payload)
    if payload[:4] == b"\x89PNG" and len(payload) >= 24:
        return (
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:4] in (b"GIF8",) and len(payload) >= 10:
        return (
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if payload[:2] == b"BM" and len(payload) >= 26:
        # the DIB header size at offset 14 disambiguates layouts: only
        # BITMAPINFOHEADER-and-later (>= 40) store i32 dims at 18/22 —
        # an OS/2 BITMAPCOREHEADER (12) stores u16s, which read as two
        # i32s would decode garbage
        if int.from_bytes(payload[14:18], "little") < 40:
            return None
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        return (abs(w), abs(h))
    return None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel in the IDAT stream
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png_pixels(payload: bytes) -> "tuple[int, int, int, bytes]":
    """REAL PNG pixel decode with the stdlib alone (zlib IDAT inflate +
    per-scanline unfiltering, PNG spec §9 filter types 0-4) — no
    imaging library. Returns ``(width, height, channels, pixels)``
    where ``pixels`` is ``height*width*channels`` interleaved bytes in
    scanline order; palette images (color type 3) are expanded to RGB.

    Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced — the shapes training
    corpora actually carry. 16-bit/sub-byte depths and Adam7 interlace
    raise NotImplementedError (rare; a real cluster wires PIL).

    Per-pixel Python is fine here: this runs inside `mapInPandas`
    executors over Arrow batches, so the driver never touches pixels
    and throughput scales with partitions; sub/up/average rows
    vectorize via the running bytearray, only Paeth is inherently
    sequential in x (left-neighbor dependency).
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    width = height = None
    bit_depth = color_type = interlace = None
    plte: "bytes | None" = None
    trns: "bytes | None" = None
    idat = bytearray()
    i, n = 8, len(payload)
    while i + 8 <= n:
        length = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            width, height = struct.unpack(">II", data[:8])
            bit_depth, color_type, _c, _f, interlace = data[8:13]
        elif ctype == b"PLTE":
            plte = bytes(data)
        elif ctype == b"tRNS":
            trns = bytes(data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + crc32
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} interlace={interlace}: only 8-bit "
            "non-interlaced streams are decoded stdlib-side"
        )
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"bad PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) < (stride + 1) * height:
        raise ValueError("IDAT shorter than filtered scanlines")
    out = bytearray(stride * height)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        prior = (
            out[(y - 1) * stride : y * stride] if y else bytes(stride)
        )
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        # expand indices -> RGB (tRNS alpha, if present, would make it
        # RGBA; expand to RGBA only when the chunk exists)
        if trns:
            rgba = bytearray(width * height * 4)
            for j, idx in enumerate(out):
                rgba[4 * j : 4 * j + 3] = plte[3 * idx : 3 * idx + 3]
                rgba[4 * j + 3] = trns[idx] if idx < len(trns) else 255
            return width, height, 4, bytes(rgba)
        rgb = bytearray(width * height * 3)
        for j, idx in enumerate(out):
            rgb[3 * j : 3 * j + 3] = plte[3 * idx : 3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, ch, bytes(out)


REAL_DECODE_SCHEMA = T.StructType(
    list(DECODE_SCHEMA.fields)
    + [
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def real_decode_images(df: DataFrame) -> DataFrame:
    """Pixel-level decode over Arrow batches (`mapInPandas`): PNG,
    baseline+progressive JPEG, GIF and BMP payloads decode for REAL
    (stdlib-only codecs); codecs outside those RAISE
    NotImplementedError (never fake pixels on the real path). Output
    adds `channels` + raw interleaved `pixels` to the metadata
    schema."""

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content)
                magic = _sniff_magic(payload)
                if magic == "png":
                    w, h, ch, px = decode_png_pixels(payload)
                elif magic == "jpeg":
                    from deltacat_spark.sources.jpeg import (
                        decode_jpeg_pixels,
                    )

                    # baseline decodes stdlib-side; progressive/
                    # arithmetic raise NotImplementedError from here
                    w, h, ch, px = decode_jpeg_pixels(payload)
                elif magic == "gif":
                    from deltacat_spark.sources.images import (
                        decode_gif_pixels,
                    )

                    w, h, ch, px = decode_gif_pixels(payload)
                elif magic == "bmp":
                    from deltacat_spark.sources.images import (
                        decode_bmp_pixels,
                    )

                    w, h, ch, px = decode_bmp_pixels(payload)
                else:
                    raise NotImplementedError(
                        f"real pixel decode for {magic!r} payloads needs "
                        "PIL/ffmpeg-style libraries not present in this "
                        "environment — PNG and baseline JPEG decode "
                        "stdlib-side"
                    )
                rows.append(
                    {
                        "path": path,
                        "n_bytes": len(payload),
                        "magic": magic,
                        "width": w,
                        "height": h,
                        "digest": hashlib.md5(payload).hexdigest(),
                        "channels": ch,
                        "pixels": px,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in REAL_DECODE_SCHEMA.fields]
            )

    return df.select("path", "content").mapInPandas(
        _decode, REAL_DECODE_SCHEMA
    )


def fake_decode_images(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Per-file \"decode\" over Arrow batches (`mapInPandas`).

    decode=\"real\" routes to :func:`real_decode_images` — PNG pixels
    decode for real (stdlib zlib inflate + unfilter); JPEG/video remain
    the env-blocked library integration point (NotImplementedError).
    decode=\"fake\" computes deterministic pseudo width/height/digest
    from the payload so the pipeline shape (schema in/out, batch sizes,
    shuffle behavior) is fully exercisable.
    """
    if decode == "real":
        return real_decode_images(df)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content)
                digest = hashlib.md5(payload).hexdigest()
                # container headers (PNG/GIF/BMP fixed-offset, JPEG SOF
                # walk) decode for REAL — byte arithmetic, no imaging
                # lib; everything else gets deterministic
                # pseudo-dimensions from the digest
                dims = parse_header_dims(payload)
                if dims is None:
                    dims = (
                        64 + int(digest[:4], 16) % 1024,
                        64 + int(digest[4:8], 16) % 1024,
                    )
                rows.append(
                    {
                        "path": path,
                        "n_bytes": len(payload),
                        "magic": _sniff_magic(payload),
                        "width": dims[0],
                        "height": dims[1],
                        "digest": digest,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return df.select("path", "content").mapInPandas(_decode, DECODE_SCHEMA)


MJPEG_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def decode_mjpeg_frames(
    df: DataFrame, every_n: int = 1, max_frames: int | None = None
) -> DataFrame:
    """REAL video frame decode for MJPEG streams (concatenated JPEG
    frames — the MJPEG-over-HTTP / MJPEG-AVI chunk payload shape): one
    output row per sampled frame with decoded pixel bytes. `every_n`
    keeps every n-th frame (frame sampling); `max_frames` caps frames
    per stream. Runs in `mapInPandas` executors — the driver never
    touches a payload, and per-stream cost is bounded by the sampled
    frames, so a 100-TB corpus streams through partition-parallel."""

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from deltacat_spark.sources.jpeg import (
            decode_jpeg_pixels,
            split_mjpeg_frames,
        )

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                frames = split_mjpeg_frames(bytes(content))
                kept = frames[::every_n]
                if max_frames is not None:
                    kept = kept[:max_frames]
                for no, frame in enumerate(kept):
                    w, h, ch, px = decode_jpeg_pixels(frame)
                    rows.append(
                        {
                            "path": path,
                            "frame_no": no * every_n,
                            "width": w,
                            "height": h,
                            "channels": ch,
                            "pixels": px,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MJPEG_FRAME_SCHEMA.fields]
            )

    return df.select("path", "content").mapInPandas(
        _decode, MJPEG_FRAME_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 1024,
    frame_size: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """\"Frame sampling\" plumbing for video-like payloads: explode each
    binary into fixed-size byte windows (stand-in for decoded frames) —
    one row per (path, frame_no, frame_bytes). Pure Spark built-ins, no
    Python in the hot path."""
    n = F.least(
        F.lit(max_frames),
        F.greatest(F.lit(1), (F.length("content") / every_n_bytes).cast("int")),
    )
    idx = F.explode(F.sequence(F.lit(0), n - F.lit(1))).alias("frame_no")
    return df.select("path", "content", idx).select(
        "path",
        "frame_no",
        F.substring(
            F.col("content"), F.col("frame_no") * every_n_bytes + 1, frame_size
        ).alias("frame_bytes"),
    )
