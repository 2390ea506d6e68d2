"""`schema.name-mapping.default` fallback (spec Appendix C) — imported
parquet written WITHOUT iceberg field ids resolves through the name
mapping, so a column RENAMED after import still reads its old files
(which carry the original name). Decoy shape: rename a schema field in
the table metadata (field id stays), bind the old name via the mapping,
and require the read to surface the renamed column with the imported
values — without the mapping a name-based read would silently return
nulls."""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.iceberg import (
    IcebergTable,
    _name_mapping_aliases,
    read_iceberg,
    write_iceberg,
)


def _edit_meta(root, fn):
    tbl = IcebergTable(root)
    v = tbl.current_version()
    p = os.path.join(tbl._meta_dir(), f"v{v}.metadata.json")
    meta = json.load(open(p))
    fn(meta)
    json.dump(meta, open(p, "w"))


def _rename_with_mapping(root, old, new, fid):
    def fn(meta):
        for sch in meta["schemas"]:
            for f in sch["fields"]:
                if f["name"] == old:
                    f["name"] = new
        meta.setdefault("properties", {})[
            "schema.name-mapping.default"
        ] = json.dumps(
            [{"field-id": fid, "names": [old]}]
        )

    _edit_meta(root, fn)


def test_renamed_column_reads_imported_files(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    write_iceberg(df, root)  # files carry names k, v (no field ids)
    _rename_with_mapping(root, "v", "v2", fid=2)
    got = read_iceberg(spark, root)
    assert "v2" in got.columns and "v" not in got.columns
    vals = {r.k: r.v2 for r in got.collect()}
    assert vals == {i: i * 3 for i in range(10)}  # not nulls


def test_mixed_old_and_new_files_coalesce(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(5).select(F.col("id").alias("k"),
                              (F.col("id") * 3).alias("v")),
        root,
    )
    _rename_with_mapping(root, "v", "v2", fid=2)
    # post-rename append writes files under the CURRENT name
    write_iceberg(
        spark.range(100, 103).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
        ),
        root,
        mode="append",
    )
    got = {r.k: r.v2 for r in read_iceberg(spark, root).collect()}
    assert got == {
        **{i: i * 3 for i in range(5)},
        **{i: i * 3 for i in range(100, 103)},
    }


def test_mapping_without_rename_is_inert(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(5).select(F.col("id").alias("k")), root
    )

    def fn(meta):
        meta.setdefault("properties", {})[
            "schema.name-mapping.default"
        ] = json.dumps([{"field-id": 1, "names": ["k"]}])

    _edit_meta(root, fn)
    assert read_iceberg(spark, root).count() == 5


def test_nested_mapping_refuses(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(spark.range(3).select(F.col("id").alias("k")), root)

    def fn(meta):
        meta.setdefault("properties", {})[
            "schema.name-mapping.default"
        ] = json.dumps(
            [{"field-id": 1, "names": ["k"],
              "fields": [{"field-id": 9, "names": ["x"]}]}]
        )

    _edit_meta(root, fn)
    with pytest.raises(NotImplementedError, match="nested"):
        read_iceberg(spark, root)


def test_ambiguous_alias_refuses(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(3).select(F.col("id").alias("k"),
                              (F.col("id") * 2).alias("w")),
        root,
    )

    def fn(meta):
        # alias "w" claimed for field 1 while field 2 is still named w
        meta.setdefault("properties", {})[
            "schema.name-mapping.default"
        ] = json.dumps([{"field-id": 1, "names": ["w"]}])

    _edit_meta(root, fn)
    with pytest.raises(ValueError, match="claimed by both"):
        read_iceberg(spark, root)


def test_alias_helper_shapes(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(3).select(F.col("id").alias("k")), root
    )
    _rename_with_mapping(root, "k", "key", fid=1)
    meta = IcebergTable(root).metadata()
    assert _name_mapping_aliases(meta) == {"key": ["k", "key"]}
