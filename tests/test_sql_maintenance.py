"""SQL statements for the maintenance/lineage surface added in round 8:

* ``RESTORE TABLE t TO VERSION AS OF n`` / ``TO TIMESTAMP AS OF ...``
  → `restore_table` (returns the new log version in the `rows` column)
* ``CREATE TABLE dst SHALLOW|DEEP CLONE src [VERSION AS OF n]``
  → `clone_table`
* ``table_changes('t', from_v[, to_v])`` inside any SELECT
  → `read_changes` registered as a temp view (Delta-style CDC table
  function), composable with joins/filters/aggregation.
"""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.plans.transforms import PartitionKey
from deltacat_spark.schema import Field, Schema


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "sqlmaint"))
    c.create_table(
        "t",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("v", T.IntegerType()),
            ]
        ),
    )
    c.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
    return c


def test_sql_restore_to_version(cat):
    v0 = cat.snapshot("t").version
    cat.sql("INSERT INTO t VALUES (3, 30)")
    cat.sql("UPDATE t SET v = 0 WHERE id = 1")
    res = cat.sql(f"RESTORE TABLE t TO VERSION AS OF {v0}").collect()[0]
    assert res.operation == "RESTORE TABLE"
    assert res.rows == cat.snapshot("t").version  # the restore commit
    got = {r.id: r.v for r in cat.read_table("t").collect()}
    assert got == {1: 10, 2: 20}
    # history is intact: the pre-restore state is still time-travelable
    pre = {
        r.id: r.v
        for r in cat.read_table("t", version_as_of=res.rows - 1).collect()
    }
    assert pre[1] == 0 and pre[3] == 30


def test_sql_restore_to_timestamp(cat):
    snap0 = cat.snapshot("t")
    ts0 = snap0.timestamp_ms
    cat.sql("INSERT INTO t VALUES (9, 90)")
    cat.sql(f"RESTORE TABLE t TO TIMESTAMP AS OF {ts0}")
    assert {r.id for r in cat.read_table("t").collect()} == {1, 2}


def test_sql_shallow_clone_and_version_pin(cat):
    v0 = cat.snapshot("t").version
    cat.sql("INSERT INTO t VALUES (3, 30)")
    res = cat.sql(
        f"CREATE TABLE t_old SHALLOW CLONE t VERSION AS OF {v0}"
    ).collect()[0]
    assert "SHALLOW CLONE" in res.operation
    assert {r.id for r in cat.read_table("t_old").collect()} == {1, 2}
    # the clone evolves independently of the source
    cat.sql("INSERT INTO t_old VALUES (99, 0)")
    assert {r.id for r in cat.read_table("t_old").collect()} == {1, 2, 99}
    assert {r.id for r in cat.read_table("t").collect()} == {1, 2, 3}


def test_sql_deep_clone(cat):
    cat.sql("CREATE TABLE t_copy DEEP CLONE t")
    assert {r.id: r.v for r in cat.read_table("t_copy").collect()} == {
        1: 10,
        2: 20,
    }


def test_sql_table_changes_function(cat):
    # CDC is exact for append-family and merge-on-read tables; CoW
    # merge commits rewrite resolved files and carry no delta rows.
    cat.create_table(
        "m",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("v", T.IntegerType()),
            ]
        ),
        properties={"read_optimization": "none"},
    )
    v0 = cat.snapshot("m").version
    cat.sql("INSERT INTO m VALUES (3, 30), (4, 40)")
    cat.sql("INSERT INTO m VALUES (5, 50)")
    rows = cat.sql(
        f"SELECT id, v, _change_type, _commit_version"
        f" FROM table_changes('m', {v0}) ORDER BY id"
    ).collect()
    assert [r.id for r in rows] == [3, 4, 5]
    # change rows are stamped with the commit's DeltaType
    assert all(r._change_type == "UPSERT" for r in rows)
    assert rows[0]._commit_version < rows[2]._commit_version
    # bounded range + composition with aggregation
    v1 = rows[0]._commit_version
    n = cat.sql(
        f"SELECT count(*) AS n FROM table_changes('m', {v0}, {v1})"
    ).collect()[0].n
    assert n == 2


def test_sql_restore_bad_version_raises(cat):
    with pytest.raises(Exception):
        cat.sql("RESTORE TABLE t TO VERSION AS OF 9999")


def test_sql_clone_existing_dst_raises(cat):
    cat.sql("CREATE TABLE dst SHALLOW CLONE t")
    with pytest.raises(Exception):
        cat.sql("CREATE TABLE dst SHALLOW CLONE t")


def test_sql_table_changes_unknown_table_raises(cat):
    with pytest.raises(Exception):
        cat.sql("SELECT * FROM table_changes('nope', 0)")


def test_sql_describe_detail(cat):
    row = cat.sql("DESCRIBE DETAIL t").collect()[0]
    assert row.name == "t"
    assert row.version == cat.snapshot("t").version
    assert row.num_files >= 1
    assert row.num_records == 2
    assert row.size_bytes > 0
    assert row.partition_columns == ""
    import json

    props = json.loads(row.properties)
    assert isinstance(props, dict)
    # location is the real table root (log dir lives under it)
    import os

    assert os.path.isdir(row.location)


def test_sql_describe_detail_partitioned_counts(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "dd"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id long, p string, v int"
    )
    c.create_table(
        "pt",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("p", T.StringType()),
                Field("v", T.IntegerType()),
            ]
        ),
        partition_scheme=[PartitionKey("p")],
    )
    c.write_to_table(df, "pt", mode="merge")
    row = c.sql("DESCRIBE DETAIL pt").collect()[0]
    assert row.partition_columns == "p"
    assert row.num_records == 3


def test_sql_show_tblproperties(cat):
    cat.sql("ALTER TABLE t SET TBLPROPERTIES ('owner'='me', 'x.y'='1')")
    rows = {r.key: r.value for r in cat.sql("SHOW TBLPROPERTIES t").collect()}
    assert rows["owner"] == "me" and rows["x.y"] == "1"
    one = cat.sql("SHOW TBLPROPERTIES t ('x.y')").collect()
    assert len(one) == 1 and one[0].value == "1"
    with pytest.raises(ValueError, match="not set"):
        cat.sql("SHOW TBLPROPERTIES t ('nope')")


def test_tags_create_read_drop(cat):
    v0 = cat.snapshot("t").version
    pinned = cat.create_tag("t", "launch")
    assert pinned == v0
    cat.sql("INSERT INTO t VALUES (3, 30)")
    # Python read path
    assert {r.id for r in cat.read_table("t", tag="launch").collect()} == {1, 2}
    assert {r.id for r in cat.read_table("t").collect()} == {1, 2, 3}
    # SQL read path: VERSION AS OF 'tag'
    got = cat.sql("SELECT id FROM t VERSION AS OF 'launch' ORDER BY id")
    assert [r.id for r in got.collect()] == [1, 2]
    # joins current-vs-tag
    n = cat.sql(
        "SELECT count(*) AS n FROM t a LEFT ANTI JOIN "
        "t VERSION AS OF 'launch' b ON a.id = b.id"
    ).collect()[0].n
    assert n == 1
    assert cat.list_tags("t") == {"launch": v0}
    cat.drop_tag("t", "launch")
    assert cat.list_tags("t") == {}
    with pytest.raises(ValueError, match="no tag"):
        cat.read_table("t", tag="launch")


def test_tags_sql_statements(cat):
    v0 = cat.snapshot("t").version
    res = cat.sql("ALTER TABLE t CREATE TAG v1").collect()[0]
    assert res.operation == "ALTER TABLE CREATE TAG" and res.rows == v0
    cat.sql("INSERT INTO t VALUES (4, 40)")
    cat.sql(f"ALTER TABLE t CREATE TAG pinned AS OF VERSION {v0}")
    rows = {
        r.tag: r.version for r in cat.sql("SHOW TAGS t").collect()
    }
    assert rows == {"v1": v0, "pinned": v0}
    # duplicate rejected; OR REPLACE moves the tag
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("ALTER TABLE t CREATE TAG v1")
    head = cat.snapshot("t").version
    res = cat.sql("ALTER TABLE t CREATE OR REPLACE TAG v1").collect()[0]
    assert res.rows == head
    cat.sql("ALTER TABLE t DROP TAG pinned")
    rows = {r.tag: r.version for r in cat.sql("SHOW TAGS t").collect()}
    assert rows == {"v1": head}


def test_tag_version_validation(cat):
    with pytest.raises(ValueError, match="out of range"):
        cat.create_tag("t", "bad", version=9999)
    with pytest.raises(ValueError, match="tag name"):
        cat.create_tag("t", "not ok")
    with pytest.raises(ValueError, match="at most one"):
        cat.read_table("t", tag="x", version_as_of=1)


def test_tag_inside_string_literal_untouched(cat):
    cat.create_tag("t", "launch")
    got = cat.sql(
        "SELECT 'reads t VERSION AS OF ''launch'' later' AS s"
    ).collect()[0].s
    assert "VERSION AS OF" in got
