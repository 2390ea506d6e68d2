"""Jar-free Apache Hudi CoW interop tests (`sources/hudi.py`).

Reference surface: DatastoreType HUDI (`types/media.py:353-420`) — the
third lakehouse format next to Iceberg and Delta. No hudi-spark bundle
exists here, so the module implements the published CoW table layout
(timeline `.commit` JSON, file-group slices, hoodie meta columns);
these tests assert round-trips, upsert copy-on-write semantics, time
travel by instant, partition pruning, and incremental pulls.
"""

import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.hudi import (
    META_COLS,
    completed_instants,
    file_slices,
    read_hudi,
    read_hudi_incremental,
    table_properties,
    write_hudi,
)


@pytest.fixture()
def df60(spark):
    return spark.range(0, 60).select(
        "id",
        (F.col("id") % 3).cast("string").alias("cat"),
        (F.col("id") * 1.5).alias("v"),
    )


def test_insert_read_roundtrip_partitioned(spark, tmp_path, df60):
    root = str(tmp_path / "h")
    instant = write_hudi(
        df60, root, record_key_field="id", operation="insert",
        partition_by=["cat"],
    )
    assert completed_instants(root) == [instant]
    props = table_properties(root)
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"
    assert props["hoodie.table.recordkey.fields"] == "id"
    back = read_hudi(spark, root)
    assert sorted(back.columns) == sorted(df60.columns)
    assert sorted(map(tuple, back.select(*df60.columns).collect())) == sorted(
        map(tuple, df60.collect())
    )
    # meta columns ride in the files when not dropped
    raw = read_hudi(spark, root, drop_meta=False)
    for m in META_COLS:
        assert m in raw.columns
    # one file group per partition value on a fresh insert
    assert len(file_slices(root)) == 3


def test_upsert_rewrites_only_touched_groups(spark, tmp_path, df60):
    root = str(tmp_path / "h")
    write_hudi(df60, root, record_key_field="id", operation="insert",
               partition_by=["cat"])
    before = {s["file_id"]: s for s in file_slices(root)}
    # update two rows in cat=0 and insert one brand-new key in cat=1
    upd = spark.createDataFrame(
        [(0, "0", 99.0), (3, "0", 98.0), (1000, "1", 1.0)],
        "id long, cat string, v double",
    )
    write_hudi(upd, root, record_key_field="id")
    after = {s["file_id"]: s for s in file_slices(root)}
    # cat=0's group rewritten (same file_id, new slice path);
    # cat=2 untouched (identical path)
    changed = [
        fid for fid in before
        if after[fid]["path"] != before[fid]["path"]
    ]
    assert len(changed) == 1
    kept = [fid for fid in before if after[fid]["path"] == before[fid]["path"]]
    assert len(kept) == 2
    # new key landed in a NEW file group
    assert len(after) == len(before) + 1
    back = read_hudi(spark, root)
    assert back.count() == 61
    got = {
        r.id: r.v for r in back.filter(F.col("id").isin(0, 3, 1000)).collect()
    }
    assert got == {0: 99.0, 3: 98.0, 1000: 1.0}


def test_time_travel_and_incremental(spark, tmp_path, df60):
    root = str(tmp_path / "h")
    i1 = write_hudi(df60, root, record_key_field="id", operation="insert",
                    partition_by=["cat"])
    upd = spark.createDataFrame(
        [(0, "0", 99.0), (2000, "2", 7.0)], "id long, cat string, v double"
    )
    i2 = write_hudi(upd, root, record_key_field="id")
    assert i2 > i1
    # as-of the first instant: original values, original count
    old = read_hudi(spark, root, as_of=i1)
    assert old.count() == 60
    assert old.filter("id = 0").collect()[0].v == 0.0
    # latest: updated
    assert read_hudi(spark, root).count() == 61
    # incremental pull (i1, i2]: exactly the changed/added rows, even
    # though the rewritten slice carries untouched rows too
    inc = read_hudi_incremental(spark, root, begin_instant=i1)
    assert sorted(r.id for r in inc.collect()) == [0, 2000]
    assert all(
        r._hoodie_commit_time == i2
        for r in inc.select("_hoodie_commit_time").collect()
    )


def test_partition_pruning_reads_fewer_files(spark, tmp_path, df60):
    root = str(tmp_path / "h")
    write_hudi(df60, root, record_key_field="id", operation="insert",
               partition_by=["cat"])
    pruned = read_hudi(spark, root, partition_filter={"cat": "1"})
    assert pruned.count() == 20
    assert set(r.cat for r in pruned.select("cat").collect()) == {"1"}
    # pruning is file-level: the plan reads 1 of 3 slice files
    files = [
        f.filePath
        for f in pruned.select(F.input_file_name().alias("filePath"))
        .distinct()
        .collect()
    ]
    assert len(files) == 1 and "cat=1" in files[0]


def test_datastore_registry_roundtrip(spark, tmp_path, df60):
    from deltacat_spark.sources.formats import read_url, write_url

    url = "hudi+file://" + str(tmp_path / "t")
    write_url(df60, url, datastore="hudi", mode="append",
              options={"record_key_field": "id"})
    assert read_url(spark, url).count() == 60


def test_cluster_replacecommit_and_clean(spark, tmp_path, df60):
    from deltacat_spark.sources.hudi import (
        clean_hudi,
        cluster_hudi,
        read_hudi_incremental,
    )

    root = str(tmp_path / "h")
    i1 = write_hudi(df60, root, record_key_field="id", operation="insert",
                    partition_by=["cat"])
    # two more batches of NEW keys -> extra file groups per partition
    i2 = write_hudi(
        spark.createDataFrame(
            [(100 + j, str(j % 3), 1.0) for j in range(6)],
            "id long, cat string, v double",
        ),
        root, record_key_field="id",
    )
    i3 = write_hudi(
        spark.createDataFrame(
            [(200 + j, str(j % 3), 2.0) for j in range(6)],
            "id long, cat string, v double",
        ),
        root, record_key_field="id",
    )
    assert len(file_slices(root)) == 9  # 3 partitions x 3 groups
    before = {r.id: (r.cat, r.v) for r in read_hudi(spark, root).collect()}

    ci = cluster_hudi(spark, root)
    assert ci is not None and ci > i3
    after_slices = file_slices(root)
    assert len(after_slices) == 3  # one group per partition
    after = {r.id: (r.cat, r.v) for r in read_hudi(spark, root).collect()}
    assert after == before
    # time travel to BEFORE the clustering still sees the old layout
    assert len(file_slices(root, as_of=i3)) == 9
    assert {
        r.id for r in read_hudi(spark, root, as_of=i2).collect()
    } == set(range(60)) | {100 + j for j in range(6)}
    # incremental pull across the clustering instant: no duplicates,
    # and the replacecommit contributes nothing
    inc = read_hudi_incremental(spark, root, begin_instant=i1)
    ids = sorted(r.id for r in inc.collect())
    assert ids == sorted(
        [100 + j for j in range(6)] + [200 + j for j in range(6)]
    )
    # clustered rows keep their ORIGINAL commit times
    raw = read_hudi(spark, root, drop_meta=False)
    assert {r._hoodie_commit_time for r in raw.collect()} == {i1, i2, i3}

    # idempotent: nothing left with >= 2 groups
    assert cluster_hudi(spark, root) is None

    # cleaner: retain only the latest position -> the 9 replaced files
    # go away, the snapshot read is untouched
    doomed = clean_hudi(root, keep_instants=1)
    assert len(doomed) == 9
    assert {
        r.id: (r.cat, r.v) for r in read_hudi(spark, root).collect()
    } == before


def test_catalog_export_import_bridge(spark, tmp_path, df60):
    from deltacat_spark.catalog import Catalog
    from deltacat_spark.schema import Schema
    from deltacat_spark.sources.hudi import (
        export_table_to_hudi,
        import_hudi_to_table,
    )

    cat = Catalog(spark, str(tmp_path / "cat"))
    sch = Schema.from_dataframe(df60)
    for f in sch.fields:
        if f.name == "id":
            f.merge_key = True
            f.nullable = False
    cat.create_table("src", schema=sch)
    cat.write_to_table(df60, "src", mode="merge")
    dest = str(tmp_path / "hudi_out")
    export_table_to_hudi(cat, "src", dest)  # merge key auto-detected
    assert read_hudi(spark, dest).count() == 60
    # table mutates; re-export upserts (CoW) instead of duplicating
    cat.write_to_table(
        spark.createDataFrame([(0, "0", 777.0)], "id long, cat string, v double"),
        "src", mode="merge",
    )
    export_table_to_hudi(cat, "src", dest)
    back = read_hudi(spark, dest)
    assert back.count() == 60
    assert back.filter("id = 0").collect()[0].v == 777.0
    import_hudi_to_table(cat, spark, dest, "roundtrip")
    assert sorted(map(tuple, cat.read_table("roundtrip").collect())) == sorted(
        map(tuple, back.collect())
    )


def test_unpartitioned_and_validation(spark, tmp_path, df60):
    root = str(tmp_path / "h")
    write_hudi(df60.limit(5), root, record_key_field="id")
    assert file_slices(root)[0]["partition"] == "default"
    assert read_hudi(spark, root).count() == 5
    # operation="delete" is implemented since r14 (test_hudi_delete_blocks)
    with pytest.raises(ValueError):
        write_hudi(df60, root, record_key_field="id", operation="bulk_zap")
    with pytest.raises(ValueError):
        write_hudi(df60, root, record_key_field="id", partition_by=["cat"])
    # a declared table_type that contradicts the table's is refused
    # (MoR itself is implemented — see test_hudi_mor.py)
    with pytest.raises(ValueError):
        write_hudi(
            df60,
            root,
            record_key_field="id",
            table_type="MERGE_ON_READ",
        )
