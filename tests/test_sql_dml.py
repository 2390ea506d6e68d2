"""SQL DML bridge (`Catalog.sql`): INSERT INTO / DELETE FROM / UPDATE
mapped onto the catalog write path. The conditions and payload SELECTs
are parsed by Spark itself — this bridge only routes statements, so the
SQL dialect is exactly Spark's."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "sqldml"))
    c.create_table(
        "users",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("name", T.StringType()),
                Field("age", T.IntegerType()),
            ]
        ),
    )
    c.sql("INSERT INTO users VALUES (1, 'ann', 30), (2, 'bob', 40), (3, 'cy', 50)")
    return c


def test_insert_values_and_select(cat):
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got == {1: ("ann", 30), 2: ("bob", 40), 3: ("cy", 50)}
    # INSERT ... SELECT reading a catalog table (self-referential)
    res = cat.sql(
        "INSERT INTO users SELECT id + 10 AS id, name, age + 1 AS age"
        " FROM users WHERE age >= 40"
    )
    assert res.collect()[0].rows == 2
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got == {1: 30, 2: 40, 3: 50, 12: 41, 13: 51}


def test_insert_with_column_list(cat):
    cat.sql("INSERT INTO users (id, name, age) VALUES (9, 'zed', 60)")
    got = {r.id: r.name for r in cat.read_table("users").collect()}
    assert got[9] == "zed"


def test_delete_where_and_full_delete(cat):
    res = cat.sql("DELETE FROM users WHERE age > 35")
    assert res.collect()[0].rows == 2
    assert {r.id for r in cat.read_table("users").collect()} == {1}
    res2 = cat.sql("DELETE FROM users")
    assert res2.collect()[0].rows == 1
    assert cat.read_table("users").count() == 0


def test_update_set_where(cat):
    res = cat.sql(
        "UPDATE users SET age = age + 1, name = upper(name) WHERE id <= 2"
    )
    assert res.collect()[0].rows == 2
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got == {1: ("ANN", 31), 2: ("BOB", 41), 3: ("cy", 50)}
    # UPDATE without WHERE touches every row
    cat.sql("UPDATE users SET age = 0")
    assert {r.age for r in cat.read_table("users").collect()} == {0}


def test_update_merges_not_duplicates(cat):
    cat.sql("UPDATE users SET age = 99 WHERE id = 1")
    assert cat.read_table("users").count() == 3  # upsert, not append


def test_select_still_works(cat):
    df = cat.sql("SELECT count(*) AS n FROM users WHERE age < 45")
    assert df.collect()[0].n == 2


def test_malformed_set_raises(cat):
    with pytest.raises(ValueError, match="malformed SET"):
        cat.sql("UPDATE users SET age 31 WHERE id = 1")


def test_dml_is_versioned_like_api_writes(cat):
    v0 = cat.snapshot("users").version
    cat.sql("UPDATE users SET age = 1 WHERE id = 1")
    snap = cat.snapshot("users")
    assert snap.version > v0
    old = cat.read_table("users", version_as_of=v0)
    assert {r.age for r in old.collect()} == {30, 40, 50}  # time travel intact
