"""Storage-layer filesystem seam: the catalog control plane runs against
any PyArrow filesystem through `storage/fs.py` (reference parity:
`deltacat/catalog/model/properties.py` resolves any pyarrow FS)."""

import pytest

from deltacat_spark.catalog.catalog import Catalog
from deltacat_spark.storage.commit import Commit, CommitLog, TxnMarkers
from deltacat_spark.storage.fs import ArrowFS, LocalFS


@pytest.fixture
def arrow_fs():
    from pyarrow.fs import LocalFileSystem

    return ArrowFS(LocalFileSystem())


def test_commit_log_on_arrow_fs(tmp_path, arrow_fs):
    log = CommitLog(str(tmp_path / "t"), fs=arrow_fs)
    assert log.versions() == []
    assert log.try_commit(Commit(version=1, operation="CREATE"))
    # put-if-absent collision detected through the seam
    assert not log.try_commit(Commit(version=1, operation="CREATE"))
    log.commit(Commit(version=2, operation="APPEND", delta_type="APPEND"))
    assert log.versions() == [1, 2]
    assert log.read_commit(2).operation == "APPEND"
    log.write_checkpoint(2, {"x": 1})
    assert log.latest_checkpoint() == (2, {"x": 1})


def test_txn_markers_on_arrow_fs(tmp_path, arrow_fs):
    m = TxnMarkers(str(tmp_path), fs=arrow_fs)
    m.begin("abc")
    assert m.status("abc") == "pending"
    m.finalize("abc")
    assert m.status("abc") == "committed"
    m.begin("xyz")
    m.abort("xyz")
    assert m.status("xyz") == "aborted"
    assert m.status("never-began") == "aborted"


def test_catalog_roundtrip_on_arrow_fs(spark, tmp_path, arrow_fs):
    cat = Catalog(spark, str(tmp_path / "cat"), fs=arrow_fs)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    cat.write_to_table(df, "t", mode="auto")
    cat.write_to_table(
        spark.createDataFrame([(3, "c")], "id long, v string"), "t", mode="append"
    )
    out = cat.read_table("t").orderBy("id").collect()
    assert [(r.id, r.v) for r in out] == [(1, "a"), (2, "b"), (3, "c")]
    # vacuum walks through the seam (nothing is old enough to delete,
    # then everything unreferenced is with age 0)
    assert cat.vacuum("t") == 0
    cat.write_to_table(
        spark.createDataFrame([(9, "z")], "id long, v string"), "t", mode="replace"
    )
    assert cat.vacuum("t", retain_versions=0, min_age_seconds=0) > 0
    assert [r.v for r in cat.read_table("t").collect()] == ["z"]


def test_put_files_on_arrow_fs(spark, tmp_path, arrow_fs):
    cat = Catalog(spark, str(tmp_path / "cat"), fs=arrow_fs)
    payload = tmp_path / "blob.bin"
    payload.write_bytes(b"\x00\x01binary")
    cat.put_files([str(payload)], "media")
    snap = cat.snapshot("media")
    assert len(snap.files) == 1
    assert snap.files[0].content_type == "application/octet-stream"


def test_local_fs_put_if_absent_atomicity(tmp_path):
    fs = LocalFS()
    p = str(tmp_path / "slot.json")
    assert fs.put_if_absent(p, "one")
    assert not fs.put_if_absent(p, "two")
    assert fs.read_text(p) == "one"


def test_arrow_fs_relpath_and_join(arrow_fs):
    assert arrow_fs.join("/a/b", "c", "d.json") == "/a/b/c/d.json"
    assert arrow_fs.relpath("/a/b/c/d.json", "/a/b") == "c/d.json"
    with pytest.raises(ValueError):
        arrow_fs.relpath("/elsewhere/x", "/a/b")
