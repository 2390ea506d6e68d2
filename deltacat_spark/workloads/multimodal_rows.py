"""Multimodal codec driver rows — the binary-column encode→decode
round-trips run as oracle-checked queries.

Reference surface: media datastore types IMAGE/AUDIO
(`types/media.py:353-420`). The multimodal path was previously
pytest-only (the oracle can't parse a PNG); these rows close that gap
by SYNTHESIZING the payloads from integer formulas over `documents`
keys inside the executors, encoding them with the product encoders
(`sources/images.py:encode_png`, `sources/audio.py:encode_wav`),
decoding them back through the product decode paths
(`real_decode_images`, `decode_audio`), and emitting integer-exact /
dyadic-exact features the DuckDB oracle reproduces from the same
formulas — a wrong filter, chunk CRC layout, PCM normalization, or
unfilter path shows up as a value-hash mismatch.

Float exactness: every emitted double is either a dyadic rational
(|v|/32768 with v integer), an exactly-representable sum of dyadics
(Σv²/2³⁶ with Σv² < 2⁵³ — order-independent in IEEE754), or a single
correctly-rounded op (sqrt, one division) on such values, so numpy
and DuckDB agree bit-for-bit.

Scale shape: blobs live only inside `mapInPandas` Arrow batches —
synthesize, encode, decode, reduce to per-doc features without the
driver ever touching a payload; 100-TB corpora stream the same way
with real files behind `binary_file_table`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from deltacat_spark.workloads.base import load

_N_SAMPLES = 64
_RATE = 8000

_WAV_SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def wav_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM16 mono WAVs synthesized per document key, encoded with
    `encode_wav`, decoded through `decode_audio` — features must equal
    the oracle's closed-form values."""

    def _synth(batches):
        import struct

        import pandas as pd

        from deltacat_spark.sources.audio import encode_wav

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                vals = [
                    ((d * 37 + k * 11) % 201) - 100
                    for k in range(_N_SAMPLES)
                ]
                pcm = struct.pack(f"<{_N_SAMPLES}h", *vals)
                rows.append(
                    {"path": str(d), "content": encode_wav(pcm, _RATE)}
                )
            yield pd.DataFrame(rows, columns=["path", "content"])

    from deltacat_spark.sources.audio import decode_audio

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id")
    )
    blobs = docs.mapInPandas(_synth, _WAV_SYNTH_SCHEMA)
    feats = decode_audio(blobs)
    return feats.select(
        F.col("path").cast("bigint").alias("doc_id"),
        F.col("channels").cast("bigint").alias("channels"),
        F.col("sample_rate").cast("bigint").alias("sample_rate"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        "duration_s",
        "rms",
        "peak",
        "zero_cross_rate",
    ).orderBy("doc_id")


WAV_CODEC_SQL = """
WITH docs AS (
    SELECT doc_id FROM documents WHERE doc_id % 5 = 0
), samples AS (
    SELECT d.doc_id, k.k,
           ((d.doc_id * 37 + k.k * 11) % 201) - 100 AS v
    FROM docs d, generate_series(0, 63) AS k(k)
), lagged AS (
    SELECT doc_id, (v < 0) AS neg,
           LAG(v < 0) OVER (PARTITION BY doc_id ORDER BY k) AS pneg
    FROM samples
), zc AS (
    SELECT doc_id,
           SUM(CASE WHEN pneg IS NOT NULL AND neg <> pneg
                    THEN 1 ELSE 0 END) AS z
    FROM lagged GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(1 AS BIGINT) AS channels,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(64 AS BIGINT) AS n_frames,
       64.0 / 8000.0 AS duration_s,
       sqrt(CAST(SUM(s.v * s.v) AS DOUBLE) / 68719476736.0) AS rms,
       CAST(MAX(ABS(s.v)) AS DOUBLE) / 32768.0 AS peak,
       CAST(z.z AS DOUBLE) / 63.0 AS zero_cross_rate
FROM samples s JOIN zc z USING (doc_id)
GROUP BY s.doc_id, z.z
ORDER BY s.doc_id
"""

_W, _H, _CH = 8, 6, 3

_PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("pix_sum", T.LongType()),
        T.StructField("pix_min", T.LongType()),
        T.StructField("pix_max", T.LongType()),
    ]
)


def png_codec_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RGB images synthesized per document key, encoded with
    `encode_png` using a DIFFERENT scanline filter per row (y mod 5 —
    all five spec filters applied), decoded back through
    `real_decode_images`; per-image pixel statistics must equal the
    oracle's closed-form values, which only happens when every
    unfilter path inverts its encoder exactly."""

    def _synth(batches):
        import pandas as pd

        from deltacat_spark.sources.images import encode_png

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = bytes(
                    (d * 31 + y * 13 + x * 7 + c * 5) % 256
                    for y in range(_H)
                    for x in range(_W)
                    for c in range(_CH)
                )
                blob = encode_png(
                    _W, _H, _CH, px, filters=[y % 5 for y in range(_H)]
                )
                rows.append({"path": str(d), "content": blob})
            yield pd.DataFrame(rows, columns=["path", "content"])

    def _stats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, w, h, ch, px in zip(
                pdf["path"],
                pdf["width"],
                pdf["height"],
                pdf["channels"],
                pdf["pixels"],
            ):
                a = np.frombuffer(bytes(px), dtype=np.uint8)
                rows.append(
                    {
                        "path": path,
                        "width": int(w),
                        "height": int(h),
                        "channels": int(ch),
                        "pix_sum": int(a.sum()),
                        "pix_min": int(a.min()),
                        "pix_max": int(a.max()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PNG_STATS_SCHEMA]
            )

    from deltacat_spark.sources.multimodal import real_decode_images

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )
    blobs = docs.mapInPandas(_synth, _WAV_SYNTH_SCHEMA)
    decoded = real_decode_images(blobs)
    stats = decoded.mapInPandas(_stats, _PNG_STATS_SCHEMA)
    return stats.select(
        F.col("path").cast("bigint").alias("doc_id"),
        "width",
        "height",
        "channels",
        "pix_sum",
        "pix_min",
        "pix_max",
    ).orderBy("doc_id")


PNG_CODEC_SQL = """
WITH docs AS (
    SELECT doc_id FROM documents WHERE doc_id % 10 = 0
), px AS (
    SELECT d.doc_id,
           (d.doc_id * 31 + y.y * 13 + x.x * 7 + c.c * 5) % 256 AS p
    FROM docs d,
         generate_series(0, 5) AS y(y),
         generate_series(0, 7) AS x(x),
         generate_series(0, 2) AS c(c)
)
SELECT doc_id,
       CAST(8 AS BIGINT) AS width,
       CAST(6 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels,
       CAST(SUM(p) AS BIGINT) AS pix_sum,
       CAST(MIN(p) AS BIGINT) AS pix_min,
       CAST(MAX(p) AS BIGINT) AS pix_max
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""


_JPEG_W, _JPEG_H = 16, 16  # four 8x8 blocks

_JPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("pix_sum", T.LongType()),
        T.StructField("pix_min", T.LongType()),
        T.StructField("pix_max", T.LongType()),
    ]
)


def jpeg_codec_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grayscale JPEGs synthesized per document key as BLOCKWISE-FLAT
    16x16 images (four 8x8 blocks, one value each), encoded with
    `encode_jpeg_gray` (unit quantization) and decoded back through
    `real_decode_images` — flat blocks make the lossy codec EXACT
    (DC-only FDCT, exact DC IDCT), so per-image pixel statistics must
    equal the oracle's closed-form values. A wrong Huffman table, DC
    prediction, zigzag walk, or IDCT normalization shifts the sum."""

    def _synth(batches):
        import pandas as pd

        from deltacat_spark.sources.jpeg import encode_jpeg_gray

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = bytes(
                    (d * 17 + ((y // 8) * 2 + (x // 8)) * 53 + 29) % 256
                    for y in range(_JPEG_H)
                    for x in range(_JPEG_W)
                )
                rows.append(
                    {
                        "path": str(d),
                        "content": encode_jpeg_gray(_JPEG_W, _JPEG_H, px),
                    }
                )
            yield pd.DataFrame(rows, columns=["path", "content"])

    def _stats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, w, h, ch, px in zip(
                pdf["path"],
                pdf["width"],
                pdf["height"],
                pdf["channels"],
                pdf["pixels"],
            ):
                a = np.frombuffer(bytes(px), dtype=np.uint8)
                rows.append(
                    {
                        "path": path,
                        "width": int(w),
                        "height": int(h),
                        "channels": int(ch),
                        "pix_sum": int(a.sum()),
                        "pix_min": int(a.min()),
                        "pix_max": int(a.max()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _JPEG_STATS_SCHEMA]
            )

    from deltacat_spark.sources.multimodal import real_decode_images

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 5)
        .select("doc_id")
    )
    blobs = docs.mapInPandas(_synth, _WAV_SYNTH_SCHEMA)
    decoded = real_decode_images(blobs)
    stats = decoded.mapInPandas(_stats, _JPEG_STATS_SCHEMA)
    return stats.select(
        F.col("path").cast("bigint").alias("doc_id"),
        "width",
        "height",
        "channels",
        "pix_sum",
        "pix_min",
        "pix_max",
    ).orderBy("doc_id")


JPEG_CODEC_SQL = """
WITH docs AS (
    SELECT doc_id FROM documents WHERE doc_id % 10 = 5
), blocks AS (
    SELECT d.doc_id, (d.doc_id * 17 + b.b * 53 + 29) % 256 AS v
    FROM docs d, generate_series(0, 3) AS b(b)
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS channels,
       CAST(64 * SUM(v) AS BIGINT) AS pix_sum,
       CAST(MIN(v) AS BIGINT) AS pix_min,
       CAST(MAX(v) AS BIGINT) AS pix_max
FROM blocks
GROUP BY doc_id
ORDER BY doc_id
"""


def jpeg_progressive_pixel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROGRESSIVE-JPEG decode as an oracle row (r11 verdict: the
    Annex G decoder was pytest-only): per-document blockwise-flat
    16x16 grayscale images encoded with
    `encode_jpeg_gray_progressive` — SOF2, four scans (DC first with
    successive-approximation point transform, DC refinement, two
    spectral AC bands coded as EOB RUNS) — then decoded through
    `real_decode_images`' progressive path. Flat blocks make the
    round-trip exact, so a broken EOB-run decode, DC refinement, band
    geometry, or point transform shifts the oracle-checked sums.
    (The encoder itself is cross-validated pixel-exact against JDK
    ImageIO in tests/test_jpeg_progressive.py.)"""

    def _synth(batches):
        import pandas as pd

        from deltacat_spark.sources.jpeg import (
            encode_jpeg_gray_progressive,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = bytes(
                    (d * 23 + ((y // 8) * 2 + (x // 8)) * 71 + 13) % 256
                    for y in range(_JPEG_H)
                    for x in range(_JPEG_W)
                )
                rows.append(
                    {
                        "path": str(d),
                        "content": encode_jpeg_gray_progressive(
                            _JPEG_W, _JPEG_H, px
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["path", "content"])

    def _stats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, w, h, ch, px in zip(
                pdf["path"],
                pdf["width"],
                pdf["height"],
                pdf["channels"],
                pdf["pixels"],
            ):
                a = np.frombuffer(bytes(px), dtype=np.uint8)
                rows.append(
                    {
                        "path": path,
                        "width": int(w),
                        "height": int(h),
                        "channels": int(ch),
                        "pix_sum": int(a.sum()),
                        "pix_min": int(a.min()),
                        "pix_max": int(a.max()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _JPEG_STATS_SCHEMA]
            )

    from deltacat_spark.sources.multimodal import real_decode_images

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 6)
        .select("doc_id")
    )
    blobs = docs.mapInPandas(_synth, _WAV_SYNTH_SCHEMA)
    decoded = real_decode_images(blobs)
    stats = decoded.mapInPandas(_stats, _JPEG_STATS_SCHEMA)
    return stats.select(
        F.col("path").cast("bigint").alias("doc_id"),
        "width",
        "height",
        "channels",
        "pix_sum",
        "pix_min",
        "pix_max",
    ).orderBy("doc_id")


JPEG_PROGRESSIVE_SQL = """
WITH docs AS (
    SELECT doc_id FROM documents WHERE doc_id % 10 = 6
), blocks AS (
    SELECT d.doc_id, (d.doc_id * 23 + b.b * 71 + 13) % 256 AS v
    FROM docs d, generate_series(0, 3) AS b(b)
)
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS channels,
       CAST(64 * SUM(v) AS BIGINT) AS pix_sum,
       CAST(MIN(v) AS BIGINT) AS pix_min,
       CAST(MAX(v) AS BIGINT) AS pix_max
FROM blocks
GROUP BY doc_id
ORDER BY doc_id
"""


def mjpeg_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-frame decode: per document, an MJPEG stream of three
    flat 8x8 grayscale JPEG frames (`encode_mjpeg`), frame-decoded via
    `decode_mjpeg_frames` — one row per (doc, frame) whose exact pixel
    sum the oracle reproduces. Broken frame splitting (a boundary
    inside entropy data), a dropped frame, or lossy drift all move the
    sums."""

    def _synth(batches):
        import pandas as pd

        from deltacat_spark.sources.jpeg import (
            encode_jpeg_gray,
            encode_mjpeg,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = [
                    encode_jpeg_gray(
                        8, 8, bytes([(d * 13 + f * 97 + 41) % 256]) * 64
                    )
                    for f in range(3)
                ]
                rows.append(
                    {"path": str(d), "content": encode_mjpeg(frames)}
                )
            yield pd.DataFrame(rows, columns=["path", "content"])

    def _stats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, fno, w, h, px in zip(
                pdf["path"],
                pdf["frame_no"],
                pdf["width"],
                pdf["height"],
                pdf["pixels"],
            ):
                a = np.frombuffer(bytes(px), dtype=np.uint8)
                rows.append(
                    {
                        "path": path,
                        "frame_no": int(fno),
                        "width": int(w),
                        "height": int(h),
                        "pix_sum": int(a.sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["path", "frame_no", "width", "height", "pix_sum"],
            )

    from deltacat_spark.sources.multimodal import decode_mjpeg_frames

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id")
    )
    blobs = docs.mapInPandas(_synth, _WAV_SYNTH_SCHEMA)
    frames = decode_mjpeg_frames(blobs)
    stats = frames.mapInPandas(
        _stats,
        T.StructType(
            [
                T.StructField("path", T.StringType()),
                T.StructField("frame_no", T.LongType()),
                T.StructField("width", T.LongType()),
                T.StructField("height", T.LongType()),
                T.StructField("pix_sum", T.LongType()),
            ]
        ),
    )
    return stats.select(
        F.col("path").cast("bigint").alias("doc_id"),
        "frame_no",
        "width",
        "height",
        "pix_sum",
    ).orderBy("doc_id", "frame_no")


MJPEG_FRAME_SQL = """
WITH docs AS (
    SELECT doc_id FROM documents WHERE doc_id % 20 = 0
)
SELECT d.doc_id,
       CAST(f.f AS BIGINT) AS frame_no,
       CAST(8 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(64 * ((d.doc_id * 13 + f.f * 97 + 41) % 256) AS BIGINT)
           AS pix_sum
FROM docs d, generate_series(0, 2) AS f(f)
ORDER BY d.doc_id, f.f
"""


QUERIES = {
    "wav_codec_features": (wav_codec_features, WAV_CODEC_SQL),
    "png_codec_pixel_stats": (png_codec_pixel_stats, PNG_CODEC_SQL),
    "jpeg_codec_pixel_stats": (jpeg_codec_pixel_stats, JPEG_CODEC_SQL),
    "jpeg_progressive_pixel_stats": (
        jpeg_progressive_pixel_stats,
        JPEG_PROGRESSIVE_SQL,
    ),
    "mjpeg_frame_stats": (mjpeg_frame_stats, MJPEG_FRAME_SQL),
}
