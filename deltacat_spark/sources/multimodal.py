"""Multimodal columns: binary payloads + typed metadata, processed with
Arrow-batched pandas transforms.

Reference surface: schemaless/multimodal tables (manifest reads,
`catalog/main/impl.py:1408-1439`) and media datastore types
(`types/media.py:353-420`). Beyond parity, this implements the
training-pipeline pattern: images/audio/video as opaque `binary` columns
with metadata, decoded/featurized inside `mapInPandas` (Arrow batches —
the only place Python touches the data plane).

The decode step itself is STUBBED: the real image/audio libraries are
not in this environment, so `decode=\"real\"` raises NotImplementedError
while `decode=\"fake\"` derives deterministic pseudo-metadata from the
bytes. The Spark-side plumbing — schema, batch iteration, partitioning —
is real and tested.
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


def fake_decode_images(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Per-file \"decode\" over Arrow batches (`mapInPandas`).

    decode=\"real\" is the integration point for PIL/ffmpeg-style
    libraries (NotImplementedError here); decode=\"fake\" computes
    deterministic pseudo width/height/digest from the payload so the
    pipeline shape (schema in/out, batch sizes, shuffle behavior) is
    fully exercisable.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding needs image/audio libraries not present in "
            "this environment — wire PIL/torchaudio/ffmpeg here"
        )

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
