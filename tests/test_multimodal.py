"""F7 `docs_schemaless` tests: schemaless binary tables return manifests,
payload round-trip, schema/schemaless mixing guards, mapInPandas decode
plumbing, frame sampling (FIXTURES.md F7)."""

import hashlib
import os

import pytest

from deltacat_spark.schema import SchemaError
from deltacat_spark.sources.multimodal import (
    binary_file_table,
    fake_decode_images,
    frame_sample,
)


@pytest.fixture()
def media_dir(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    payloads = {}
    for i in range(6):
        if i % 3 == 0:
            # a VALID PNG header: signature + IHDR with planted dims —
            # parse_header_dims decodes these for real
            head = (
                b"\x89PNG\r\n\x1a\n"
                + (13).to_bytes(4, "big")
                + b"IHDR"
                + (320 + i).to_bytes(4, "big")
                + (240 + i).to_bytes(4, "big")
            )
        else:
            head = [b"", b"\xff\xd8\xff", b"RIFF"][i % 3]
        body = head + bytes((i * 37 + j) % 256 for j in range(400 + i * 100))
        p = d / f"file_{i}.bin"
        p.write_bytes(body)
        payloads[str(p)] = body
    return d, payloads


def test_schemaless_manifest_roundtrip(spark, catalog, media_dir):
    d, payloads = media_dir
    catalog.put_files(sorted(payloads), "media", content_type="image/fake")
    manifest = catalog.read_table("media")
    rows = manifest.collect()
    assert len(rows) == 6
    assert {r.content_type for r in rows} == {"image/fake"}
    assert all(r.content_length > 0 for r in rows)
    # byte-exact payload round-trip through from_manifest_table
    blobs = catalog.from_manifest_table(manifest).collect()
    got = {os.path.basename(r.path): bytes(r.content) for r in blobs}
    want = {os.path.basename(p): b for p, b in payloads.items()}
    assert got == want


def test_mixing_guards(spark, catalog, media_dir):
    d, payloads = media_dir
    catalog.put_files(sorted(payloads), "media")
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(SchemaError):
        catalog.write_to_table(df, "media", mode="add")
    catalog.write_to_table(df, "tab", mode="auto")
    with pytest.raises(SchemaError):
        catalog.put_files(sorted(payloads), "tab")


def test_fake_decode_mapinpandas(spark, media_dir):
    d, payloads = media_dir
    bf = binary_file_table(spark, str(d), glob="*.bin")
    out = fake_decode_images(bf).collect()
    assert len(out) == 6
    by_name = {os.path.basename(r.path): r for r in out}
    for p, body in payloads.items():
        r = by_name[os.path.basename(p)]
        assert r.n_bytes == len(body)
        assert r.digest == hashlib.md5(body).hexdigest()
        i = int(os.path.basename(p).split("_")[1].split(".")[0])
        if i % 3 == 0:
            # PNG header dims decode for REAL (byte arithmetic)
            assert r.magic == "png"
            assert (r.width, r.height) == (320 + i, 240 + i)
        else:
            assert r.magic in ("jpeg", "wav")
            assert 64 <= r.width < 64 + 1024


def test_parse_header_dims_unit():
    from deltacat_spark.sources.multimodal import parse_header_dims

    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (1920).to_bytes(4, "big") + (1080).to_bytes(4, "big")
    )
    assert parse_header_dims(png) == (1920, 1080)
    gif = b"GIF89a" + (640).to_bytes(2, "little") + (480).to_bytes(2, "little")
    assert parse_header_dims(gif) == (640, 480)
    bmp = (
        b"BM" + bytes(12)
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
        + (800).to_bytes(4, "little", signed=True)
        + (-600).to_bytes(4, "little", signed=True)  # top-down rows
    )
    assert parse_header_dims(bmp) == (800, 600)
    # OS/2 BITMAPCOREHEADER stores u16 dims — must NOT decode as i32s
    core = b"BM" + bytes(12) + (12).to_bytes(4, "little") + bytes(8)
    assert parse_header_dims(core) is None
    assert parse_header_dims(b"\xff\xd8\xffJPEG...") is None
    assert parse_header_dims(b"\x89PNG") is None  # truncated header


def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def test_parse_header_dims_jpeg_sof_walk():
    """Hand-built JPEG fixtures: the SOF segment walk reads dimensions
    through APP/COM/DQT segments, baseline and progressive, and refuses
    malformed streams (`sources/multimodal.py:_jpeg_dims`)."""
    from deltacat_spark.sources.multimodal import parse_header_dims

    def sof(marker, w, h):
        return _jpeg_seg(
            marker,
            bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )

    app0 = _jpeg_seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = _jpeg_seg(0xDB, bytes(65))
    # baseline (SOF0) behind APP0 + DQT
    jpg = b"\xff\xd8" + app0 + dqt + sof(0xC0, 1024, 768)
    assert parse_header_dims(jpg) == (1024, 768)
    # progressive (SOF2), with a COM segment and padding fill bytes
    com = _jpeg_seg(0xFE, b"a comment")
    jpg2 = b"\xff\xd8\xff" + app0[1:] + com + b"\xff" + sof(0xC2, 333, 77)[1:]
    assert parse_header_dims(jpg2) == (333, 77)
    # DHT (0xC4) is a table, not a frame header — must be skipped
    dht = _jpeg_seg(0xC4, bytes(19))
    jpg3 = b"\xff\xd8" + dht + sof(0xC1, 55, 44)
    assert parse_header_dims(jpg3) == (55, 44)
    # SOS before any SOF, EOI-only, truncated SOF, lost sync → None
    sos = _jpeg_seg(0xDA, bytes([1, 1, 0, 0, 0x3F, 0]))
    assert parse_header_dims(b"\xff\xd8" + sos + b"entropy") is None
    assert parse_header_dims(b"\xff\xd8\xff\xd9") is None
    assert parse_header_dims(jpg[: len(jpg) - 12]) is None
    assert parse_header_dims(b"\xff\xd8" + app0 + b"\x00garbage") is None


def test_real_decode_unknown_media_still_stubbed(spark, media_dir):
    """PNG and baseline JPEG decode for real now (test_png_decode.py,
    test_jpeg_decode.py); other media (audio/video) pixel decode
    remains the env-blocked library integration point — the real path
    must RAISE on those payloads, never fake pixels."""
    d, _ = media_dir
    # file_2.bin carries a RIFF (wav) magic
    bf = binary_file_table(spark, str(d)).filter("path LIKE '%file_2.bin'")
    with pytest.raises(Exception, match="real pixel decode"):
        fake_decode_images(bf, decode="real").collect()


def test_frame_sample(spark, media_dir):
    d, payloads = media_dir
    bf = binary_file_table(spark, str(d))
    frames = frame_sample(bf, every_n_bytes=256, frame_size=32).collect()
    assert all(len(bytes(r.frame_bytes)) <= 32 for r in frames)
    # one payload of ~900 bytes → ceil-ish frames, deterministic per path
    per = {}
    for r in frames:
        per.setdefault(os.path.basename(r.path), []).append(r.frame_no)
    assert all(sorted(v) == list(range(len(v))) for v in per.values())


def test_put_files_distributed_path(spark, catalog, tmp_path):
    """Bulk media ingest: above the threshold the copies run as one
    Spark job on executors; the commit metadata must be identical to the
    serial path (names, sizes, byte-exact payloads)."""
    d = tmp_path / "bulk"
    d.mkdir()
    want = {}
    for i in range(100):
        p = d / f"blob_{i:03d}.bin"
        body = bytes((i + j) % 256 for j in range(64 + i))
        p.write_bytes(body)
        want[p.name] = body
    catalog.put_files(
        sorted(str(p) for p in d.iterdir()),
        "bulk_media",
        content_type="application/fake",
        distributed_threshold=10,  # force the executor path
    )
    manifest = catalog.read_table("bulk_media")
    rows = manifest.collect()
    assert len(rows) == 100
    assert all(r.content_length == len(want[os.path.basename(r.path)]) for r in rows)
    blobs = catalog.from_manifest_table(manifest).collect()
    got = {os.path.basename(r.path): bytes(r.content) for r in blobs}
    assert got == want
