"""SQL DML × engine features: partitioned tables, pruning, concurrent
writers — the bridge must inherit every write-path behavior, since it
commits through the normal versioned programs."""

import threading

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.plans.transforms import PartitionKey
from deltacat_spark.schema import Field, Schema


def test_sql_insert_into_partitioned_records_partition_values(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "p"))
    c.create_table(
        "sales",
        schema=Schema(
            [
                Field("id", T.LongType()),
                Field("region", T.StringType()),
                Field("amt", T.IntegerType()),
            ]
        ),
        partition_scheme=[PartitionKey("region")],
    )
    c.sql(
        "INSERT INTO sales VALUES (1, 'EU', 10), (2, 'NA', 20), (3, 'EU', 30)"
    )
    snap = c.snapshot("sales")
    pvals = {f.partition_values["region"] for f in snap.files}
    assert pvals == {"EU", "NA"}
    kept = snap.prune(partition_filter={"region": "EU"})
    assert all(f.partition_values["region"] == "EU" for f in kept)
    got = {
        r.id for r in c.read_table("sales", partition_filter={"region": "EU"}).collect()
    }
    assert got == {1, 3}


def test_sql_update_on_partitioned_merge_table(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "pm"))
    c.create_table(
        "acct",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("region", T.StringType()),
                Field("bal", T.IntegerType()),
            ]
        ),
        partition_scheme=[PartitionKey("region")],
    )
    c.sql("INSERT INTO acct VALUES (1, 'EU', 5), (2, 'NA', 7)")
    c.sql("UPDATE acct SET bal = bal + 100 WHERE region = 'EU'")
    got = {r.id: r.bal for r in c.read_table("acct").collect()}
    assert got == {1: 105, 2: 7}


def test_concurrent_sql_updates_disjoint_keys(spark, tmp_path):
    """Two writers issuing SQL UPDATEs on disjoint keys: the commit
    rebase machinery must land both (SQL DML is just the write path)."""
    root = str(tmp_path / "cc")
    c0 = Catalog(spark, root)
    c0.create_table(
        "k",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("v", T.IntegerType()),
            ]
        ),
    )
    c0.sql("INSERT INTO k VALUES (1, 0), (2, 0), (3, 0), (4, 0)")
    errs = []

    def worker(ids):
        try:
            c = Catalog(spark, root)
            for i in ids:
                c.sql(f"UPDATE k SET v = {i * 10} WHERE id = {i}")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=worker, args=([1, 2],))
    t2 = threading.Thread(target=worker, args=([3, 4],))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    got = {r.id: r.v for r in c0.read_table("k").collect()}
    assert got == {1: 10, 2: 20, 3: 30, 4: 40}


def test_sql_dml_flows_through_cdc(spark, tmp_path):
    """SQL UPDATE/DELETE commit through the normal write programs, so
    read_changes sees exactly the changed rows (cdc.enabled sidecars)."""
    c = Catalog(spark, str(tmp_path / "cdc"))
    c.create_table(
        "acct",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("v", T.IntegerType()),
            ]
        ),
        properties={"cdc.enabled": True},
    )
    c.sql("INSERT INTO acct VALUES (1, 10), (2, 20), (3, 30)")
    v0 = c.snapshot("acct").version
    c.sql("UPDATE acct SET v = 99 WHERE id = 2")
    c.sql("DELETE FROM acct WHERE id = 3")
    ch = c.read_changes("acct", from_version=v0).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, []).append(r.id)
    assert by_type["MERGE"] == [2]
    assert by_type["DELETE"] == [3]


def test_sql_insert_attaches_blooms(spark, tmp_path):
    """INSERT INTO on a bloom table attaches sidecars like API writes."""
    c = Catalog(spark, str(tmp_path / "bl"))
    c.create_table(
        "pk",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("v", T.StringType()),
            ]
        ),
        properties={"bloom_filter_columns": "id"},
    )
    c.sql("INSERT INTO pk VALUES (1, 'a'), (2, 'b')")
    snap = c.snapshot("pk")
    assert all(f.bloom_ref for f in snap.files)


def test_sql_delete_keyless_table_uses_positional_path(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "nk"))
    c.create_table(
        "logs",
        schema=Schema([Field("id", T.LongType()), Field("v", T.IntegerType())]),
    )
    c.sql("INSERT INTO logs VALUES (1, 1), (2, 2), (3, 3)")
    res = c.sql("DELETE FROM logs WHERE v >= 2")
    assert res.collect()[0].rows == 2
    assert {r.id for r in c.read_table("logs").collect()} == {1}


def test_sql_utility_statements(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "util"))
    c.create_table(
        "t",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("region", T.StringType()),
                Field("v", T.IntegerType()),
            ]
        ),
        partition_scheme=[PartitionKey("region")],
    )
    c.sql("INSERT INTO t VALUES (1, 'EU', 1), (2, 'NA', 2)")
    c.sql("INSERT INTO t VALUES (3, 'EU', 3)")
    # SHOW TABLES
    assert {r.table for r in c.sql("SHOW TABLES").collect()} == {"t"}
    # DESCRIBE HISTORY: newest first, operations recorded
    h = c.sql("DESCRIBE HISTORY t").collect()
    assert [r.version for r in h] == sorted(
        (r.version for r in h), reverse=True
    )
    assert h[-1].operation == "CREATE"
    assert c.sql("DESCRIBE HISTORY t LIMIT 1").count() == 1
    # OPTIMIZE scoped to one partition: NA files untouched
    snap0 = c.snapshot("t")
    na_before = {f.path for f in snap0.files if (f.partition_values or {}).get("region") == "NA"}
    c.sql("OPTIMIZE t WHERE region = 'EU'")
    snap1 = c.snapshot("t")
    na_after = {f.path for f in snap1.files if (f.partition_values or {}).get("region") == "NA"}
    assert na_before == na_after
    assert {r.id for r in c.read_table("t").collect()} == {1, 2, 3}
    # VACUUM DRY RUN deletes nothing
    files_before = set(c.fs.walk_files(c.fs.join(c.root, "default", "t")))
    assert files_before, "table root path guess wrong - test would be vacuous"
    res = c.sql("VACUUM t DRY RUN")
    assert res.collect()[0].operation == "VACUUM DRY RUN"
    assert set(c.fs.walk_files(c.fs.join(c.root, "default", "t"))) == files_before
    # real VACUUM honors the 24h grace: fresh superseded files survive
    c.sql("VACUUM t RETAIN 0 VERSIONS")
    assert {r.id for r in c.read_table("t").collect()} == {1, 2, 3}
