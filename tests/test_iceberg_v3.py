"""Iceberg format-version 3 READ slice (r14, judge item 5): puffin
deletion vectors, the v2→v3 metadata upgrade, row-lineage surfacing,
and named refusals for the genuinely-unimplemented v3 features (new
value types, v3 writes). External shapes per the public Puffin spec
and Iceberg v3 spec (§Deletion vectors, §Row lineage)."""

import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import puffin
from deltacat_spark.sources.avrofile import read_container, write_container
from deltacat_spark.sources.iceberg import (
    IcebergTable,
    _manifest_entry_schema,
    commit_deletion_vectors,
    commit_position_deletes,
    read_iceberg,
    spark_schema_for,
    upgrade_iceberg_v2_to_v3,
    write_iceberg,
)


# ---------------------------------------------------------------------------
# puffin codec
# ---------------------------------------------------------------------------


def test_puffin_file_and_dv_blob_round_trip(tmp_path):
    p = str(tmp_path / "x.puffin")
    blob1 = puffin.dv_blob_encode([0, 3, 5, 1 << 40])
    blob2 = puffin.dv_blob_encode(list(range(5000)))  # bitmap container
    entries = puffin.write_puffin(
        p,
        [
            (blob1, {"properties": {"referenced-data-file": "data/a"}}),
            (blob2, {"properties": {"referenced-data-file": "data/b"}}),
        ],
        properties={"created-by": "test"},
    )
    assert entries[0]["offset"] == 4
    assert entries[1]["offset"] == 4 + len(blob1)
    footer = puffin.read_footer(p)
    assert footer["properties"] == {"created-by": "test"}
    assert [b["type"] for b in footer["blobs"]] == [
        puffin.DV_BLOB_TYPE
    ] * 2
    assert puffin.dv_positions(
        p, entries[0]["offset"], entries[0]["length"]
    ) == [0, 3, 5, 1 << 40]
    assert puffin.dv_positions(
        p, entries[1]["offset"], entries[1]["length"]
    ) == list(range(5000))
    got = puffin.dv_entries(p)
    assert [e["referenced-data-file"] for e in got] == ["data/a", "data/b"]


def test_puffin_corruption_and_flags(tmp_path):
    blob = puffin.dv_blob_encode([1, 2])
    bad = blob[:-1] + bytes([blob[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="CRC"):
        puffin.dv_blob_decode(bad)
    with pytest.raises(ValueError, match="magic"):
        puffin.dv_blob_decode(blob[:4] + b"\x00\x00\x00\x00" + blob[8:])
    p = str(tmp_path / "x.puffin")
    puffin.write_puffin(p, [(blob, {})])
    # flip the compressed-footer flag bit
    raw = bytearray(open(p, "rb").read())
    raw[-8] |= 1
    open(p, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="LZ4"):
        puffin.read_footer(p)
    notp = str(tmp_path / "not.puffin")
    open(notp, "wb").write(b"nope nope nope")
    with pytest.raises(ValueError, match="PFA1"):
        puffin.read_footer(notp)


# ---------------------------------------------------------------------------
# upgrade + DV read
# ---------------------------------------------------------------------------


@pytest.fixture()
def v3_table(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(30).select(
            "id", (F.col("id") % 3).cast("string").alias("cat")
        ),
        root,
    )
    write_iceberg(
        spark.range(30, 40).select(
            "id", F.lit("9").alias("cat")
        ),
        root,
        mode="append",
    )
    upgrade_iceberg_v2_to_v3(root)
    return root


def test_upgrade_v2_to_v3_reads_unchanged(spark, v3_table):
    meta = IcebergTable(v3_table).metadata()
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 0
    got = sorted(r.id for r in read_iceberg(spark, v3_table).collect())
    assert got == list(range(40))
    # idempotent
    upgrade_iceberg_v2_to_v3(v3_table)
    assert IcebergTable(v3_table).metadata()["format-version"] == 3


def test_deletion_vector_commit_and_read(spark, v3_table):
    rows = read_iceberg(spark, v3_table, with_lineage=True).collect()
    by_id = {r.id: (r["__ice_fp"], r["__ice_pos"]) for r in rows}
    kill = {3, 7, 35}
    positions: dict[str, list[int]] = {}
    for i in kill:
        fp, pos = by_id[i]
        positions.setdefault(fp, []).append(pos)
    tbl = IcebergTable(v3_table)
    pre_sid = tbl.metadata()["current-snapshot-id"]
    sid = commit_deletion_vectors(v3_table, positions)
    got = sorted(r.id for r in read_iceberg(spark, v3_table).collect())
    assert got == [i for i in range(40) if i not in kill]
    # time travel to the pre-DV snapshot still serves every row
    before = sorted(
        r.id
        for r in read_iceberg(spark, v3_table, snapshot_id=pre_sid).collect()
    )
    assert before == list(range(40))
    # the manifest entry carries the DV coordinates (fields 143-145)
    _, deletes = tbl.live_files(sid)
    assert len(deletes) == len(positions)
    for d in deletes:
        assert d["file_format"] == "PUFFIN"
        assert d["referenced_data_file"] in positions
        assert d["content_offset"] is not None
        assert d["content_size_in_bytes"] is not None


def test_second_dv_commit_accumulates(spark, v3_table):
    rows = read_iceberg(spark, v3_table, with_lineage=True).collect()
    by_id = {r.id: (r["__ice_fp"], r["__ice_pos"]) for r in rows}
    fp3, pos3 = by_id[3]
    commit_deletion_vectors(v3_table, {fp3: [pos3]})
    fp8, pos8 = by_id[8]
    commit_deletion_vectors(v3_table, {fp8: [pos8]})
    got = sorted(r.id for r in read_iceberg(spark, v3_table).collect())
    assert got == [i for i in range(40) if i not in (3, 8)]


def test_v3_refuses_position_delete_parquet_and_replace(spark, v3_table):
    deletes = spark.createDataFrame(
        [("data/x.parquet", 0)], "file_path string, pos long"
    )
    with pytest.raises(NotImplementedError, match="v2"):
        commit_position_deletes(spark, v3_table, deletes)
    # appends WRITE since r14 (row-lineage accounting); replace — which
    # would re-assign existing rows' ids — still refuses by name
    from deltacat_spark.sources.iceberg import rewrite_data_files

    with pytest.raises(NotImplementedError, match="row-id"):
        rewrite_data_files(spark, v3_table)


def test_v3_append_assigns_row_lineage(spark, v3_table):
    """Appends to a v3 table carve explicit first_row_id blocks out of
    next-row-id: new rows read non-null unique `_row_id`, pre-upgrade
    files stay unassigned (null), and the counter advances."""
    write_iceberg(
        spark.range(100, 107).select("id", F.lit("z").alias("cat")),
        v3_table,
        mode="append",
    )
    meta = IcebergTable(v3_table).metadata()
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 7
    snap = [s for s in meta["snapshots"] if "first-row-id" in s]
    assert len(snap) == 1 and snap[0]["first-row-id"] == 0
    df = read_iceberg(spark, v3_table, with_row_lineage=True)
    rows = df.collect()
    new_rows = [r for r in rows if r.id >= 100]
    old_rows = [r for r in rows if r.id < 100]
    assert sorted(r["_row_id"] for r in new_rows) == list(range(7))
    assert all(r["_row_id"] is None for r in old_rows)
    # a second append continues the block — ids stay globally unique
    write_iceberg(
        spark.range(200, 203).select("id", F.lit("z").alias("cat")),
        v3_table,
        mode="append",
    )
    meta2 = IcebergTable(v3_table).metadata()
    assert meta2["next-row-id"] == 10
    rows2 = read_iceberg(spark, v3_table, with_row_lineage=True).collect()
    assigned = [r["_row_id"] for r in rows2 if r["_row_id"] is not None]
    assert sorted(assigned) == list(range(10))


def test_v3_append_then_dv_composes(spark, v3_table):
    write_iceberg(
        spark.range(100, 105).select("id", F.lit("z").alias("cat")),
        v3_table,
        mode="append",
    )
    from deltacat_spark.sources.iceberg import delete_where_dv

    delete_where_dv(spark, v3_table, "id IN (101, 103, 5)")
    got = sorted(r.id for r in read_iceberg(spark, v3_table).collect())
    assert got == [i for i in range(40) if i != 5] + [100, 102, 104]


def test_v3_new_value_types_refuse_by_name():
    ice = {
        "type": "struct",
        "fields": [
            {"id": 1, "name": "ts", "required": False, "type": "timestamp_ns"}
        ],
    }
    with pytest.raises(NotImplementedError, match="timestamp_ns"):
        spark_schema_for(ice)


# ---------------------------------------------------------------------------
# row lineage
# ---------------------------------------------------------------------------


def test_row_lineage_surfaced(spark, v3_table):
    df = read_iceberg(spark, v3_table, with_row_lineage=True)
    assert "_row_id" in df.columns
    assert "_last_updated_sequence_number" in df.columns
    rows = df.collect()
    # files predate lineage: row ids unassigned (null), sequence
    # numbers are the files' data sequence numbers (1 and 2)
    assert all(r["_row_id"] is None for r in rows)
    seqs = {r.id: r["_last_updated_sequence_number"] for r in rows}
    assert seqs[0] == 1 and seqs[35] == 2


def test_row_lineage_first_row_id_assigned(spark, v3_table):
    """A manifest whose entries carry first_row_id (an external v3
    writer's shape) yields _row_id = first_row_id + position."""
    tbl = IcebergTable(v3_table)
    meta = tbl.metadata()
    snap = tbl.snapshot(meta)
    mf = tbl.manifests(snap)[0]
    path = os.path.join(v3_table, mf["manifest_path"])
    _, entries = read_container(path)
    first = 1000
    new_entries = []
    for e in entries:
        d = dict(e["data_file"])
        d.setdefault("equality_ids", None)
        d["first_row_id"] = first
        first += d["record_count"]
        d.setdefault("referenced_data_file", None)
        d.setdefault("content_offset", None)
        d.setdefault("content_size_in_bytes", None)
        new_entries.append(dict(e, data_file=d))
    write_container(path, _manifest_entry_schema([], v3=True), new_entries)
    df = read_iceberg(spark, v3_table, with_row_lineage=True)
    rows = [r for r in df.collect() if r["_row_id"] is not None]
    assert rows, "expected assigned row ids from first_row_id"
    assert len({r["_row_id"] for r in rows}) == len(rows)  # unique


# ---------------------------------------------------------------------------
# v3 default values
# ---------------------------------------------------------------------------


def test_single_value_json_parsing():
    import datetime
    from decimal import Decimal

    from deltacat_spark.sources.iceberg import parse_single_value_json

    assert parse_single_value_json("int", 7) == 7
    assert parse_single_value_json("string", "x") == "x"
    assert parse_single_value_json("boolean", True) is True
    assert parse_single_value_json("date", "2024-03-01") == datetime.date(
        2024, 3, 1
    )
    assert parse_single_value_json(
        "timestamp", "2024-03-01T10:30:00"
    ) == datetime.datetime(2024, 3, 1, 10, 30)
    assert parse_single_value_json("decimal(9, 2)", "12.34") == Decimal(
        "12.34"
    )
    assert parse_single_value_json("binary", "0a0b") == b"\x0a\x0b"
    with pytest.raises(NotImplementedError, match="nested"):
        parse_single_value_json({"type": "struct", "fields": []}, {})


def test_initial_default_applies_to_pre_evolution_files(spark, tmp_path):
    """Files written before a column existed read its initial-default;
    files that carry the column keep their values INCLUDING explicit
    nulls (the semantics coalesce() would get wrong)."""
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(5).select("id", F.lit("a").alias("cat")), root
    )
    # evolve: add `score: int` with initial-default 7
    tbl = IcebergTable(root)
    meta = tbl.metadata()
    import copy

    from deltacat_spark.sources.iceberg import _commit_metadata

    new = copy.deepcopy(meta)
    sch = new["schemas"][0]
    next_id = new["last-column-id"] + 1
    sch["fields"].append(
        {
            "id": next_id,
            "name": "score",
            "required": False,
            "type": "int",
            "initial-default": 7,
            "write-default": 7,
        }
    )
    new["last-column-id"] = next_id
    _commit_metadata(tbl, new)
    # second batch carries the column, one row explicitly null
    write_iceberg(
        spark.createDataFrame(
            [(10, "b", 99), (11, "b", None)],
            "id long, cat string, score int",
        ),
        root,
        mode="append",
    )
    got = {r.id: r.score for r in read_iceberg(spark, root).collect()}
    assert got == {0: 7, 1: 7, 2: 7, 3: 7, 4: 7, 10: 99, 11: None}


def test_initial_default_on_v3_table_with_dv(spark, tmp_path):
    """Defaults compose with the v3 surface: upgrade + DV delete, the
    defaulted column still fills for pre-evolution files."""
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(6).select("id", F.lit("a").alias("cat")), root
    )
    tbl = IcebergTable(root)
    import copy

    from deltacat_spark.sources.iceberg import _commit_metadata

    new = copy.deepcopy(tbl.metadata())
    nid = new["last-column-id"] + 1
    new["schemas"][0]["fields"].append(
        {
            "id": nid,
            "name": "score",
            "required": False,
            "type": "long",
            "initial-default": 5,
        }
    )
    new["last-column-id"] = nid
    _commit_metadata(tbl, new)
    upgrade_iceberg_v2_to_v3(root)
    rows = read_iceberg(spark, root, with_lineage=True).collect()
    kill = [r for r in rows if r.id in (1, 4)]
    positions: dict[str, list[int]] = {}
    for r in kill:
        positions.setdefault(r["__ice_fp"], []).append(r["__ice_pos"])
    commit_deletion_vectors(root, positions)
    got = {r.id: r.score for r in read_iceberg(spark, root).collect()}
    assert got == {0: 5, 2: 5, 3: 5, 5: 5}


# ---------------------------------------------------------------------------
# DV replacement rule + predicate DELETE (r14 tail)
# ---------------------------------------------------------------------------


def test_second_dv_commit_supersedes_per_file(spark, v3_table):
    """The v3 rule: at most ONE live DV per data file — a second DV
    against the same file merges the old positions and the
    carried-forward manifests drop the superseded puffin entry."""
    rows = read_iceberg(spark, v3_table, with_lineage=True).collect()
    by_id = {r.id: (r["__ice_fp"], r["__ice_pos"]) for r in rows}
    fp, pos3 = by_id[3]
    commit_deletion_vectors(v3_table, {fp: [pos3]})
    # second DV on the SAME file
    fp5, pos5 = by_id[5]
    assert fp5 == fp, "fixture expectation: ids 3 and 5 share a file"
    sid = commit_deletion_vectors(v3_table, {fp: [pos5]})
    got = sorted(r.id for r in read_iceberg(spark, v3_table).collect())
    assert got == [i for i in range(40) if i not in (3, 5)]
    tbl = IcebergTable(v3_table)
    _, deletes = tbl.live_files(sid)
    per_file = [d for d in deletes if d.get("referenced_data_file") == fp]
    assert len(per_file) == 1, (
        f"expected ONE live DV for {fp}, got {len(per_file)}"
    )
    # the merged blob carries both positions
    from deltacat_spark.sources import puffin as _p

    d = per_file[0]
    poss = _p.dv_positions(
        os.path.join(v3_table, d["file_path"]),
        d["content_offset"],
        d["content_size_in_bytes"],
    )
    assert set(poss) == {pos3, pos5}


def test_delete_where_dv(spark, v3_table):
    from deltacat_spark.sources.iceberg import delete_where_dv

    sid = delete_where_dv(spark, v3_table, "id % 10 = 3")
    assert sid is not None
    got = sorted(r.id for r in read_iceberg(spark, v3_table).collect())
    assert got == [i for i in range(40) if i % 10 != 3]
    # no match → None, table unchanged
    assert delete_where_dv(spark, v3_table, "id = 999") is None
    # idempotent-ish second delete composing with the first
    delete_where_dv(spark, v3_table, "id % 10 = 7")
    got = sorted(r.id for r in read_iceberg(spark, v3_table).collect())
    assert got == [i for i in range(40) if i % 10 not in (3, 7)]


def test_incremental_and_stream_accept_v3(spark, v3_table):
    """v3 keeps the v2 sequence-number model: incremental reads and
    the append stream work; a DV commit in the window is a non-append
    snapshot handled by the skip policy."""
    from deltacat_spark.sources.iceberg import read_iceberg_incremental

    inc = read_iceberg_incremental(spark, v3_table, from_sequence=1)
    got = sorted(r.id for r in inc.collect())
    assert got == list(range(30, 40))  # the second append only
    # DV commit lands a delete snapshot; skip policy rides over it
    rows = read_iceberg(spark, v3_table, with_lineage=True).collect()
    fp, pos = next((r["__ice_fp"], r["__ice_pos"]) for r in rows if r.id == 35)
    commit_deletion_vectors(v3_table, {fp: [pos]})
    inc2 = read_iceberg_incremental(
        spark, v3_table, from_sequence=1, on_non_append="skip"
    )
    assert sorted(r.id for r in inc2.collect()) == list(range(30, 40))
    with pytest.raises(ValueError, match="non-append|delete"):
        read_iceberg_incremental(spark, v3_table, from_sequence=1).collect()
