"""F1 `users_basic` golden tests: append family, REPLACE, projection,
file_path_column, truncate/rename/drop, time travel (FIXTURES.md F1;
reference `tests/catalog/test_default_catalog_impl.py:107-114`)."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog, TableNotFoundError
from deltacat_spark.schema import Field, Schema, SchemaError


def users(spark, ids):
    return spark.createDataFrame(
        [(i, f"user_{i}", 20 + i % 50, f"city_{i % 5}") for i in ids],
        "id long, name string, age int, city string",
    )


def create_users(catalog):
    from pyspark.sql import types as T

    catalog.create_table(
        "users",
        schema=Schema(
            [
                Field("id", T.LongType()),
                Field("name", T.StringType()),
                Field("age", T.IntegerType()),
                Field("city", T.StringType()),
            ]
        ),
    )


def test_append_read_roundtrip(spark, catalog):
    df = users(spark, range(10))
    create_users(catalog)
    catalog.write_to_table(df, "users", mode="append")
    out = catalog.read_table("users")
    assert sorted(r.id for r in out.collect()) == list(range(10))
    catalog.write_to_table(users(spark, range(10, 15)), "users", mode="append")
    assert catalog.read_table("users").count() == 15


def test_add_unordered(spark, catalog):
    create_users(catalog)
    catalog.write_to_table(users(spark, range(5)), "users", mode="add")
    snap = catalog.snapshot("users")
    assert snap.commits[-1].stream_position is None
    assert catalog.read_table("users").count() == 5


def test_replace_truncates_and_time_travels(spark, catalog):
    create_users(catalog)
    catalog.write_to_table(users(spark, range(10)), "users", mode="append")
    v1 = catalog.snapshot("users").version
    catalog.write_to_table(users(spark, range(100, 103)), "users", mode="replace")
    assert sorted(r.id for r in catalog.read_table("users").collect()) == [100, 101, 102]
    # old snapshot still readable (stream kept for time travel —
    # reference REPLACE semantics, `catalog/main/impl.py:531-552`)
    old = catalog.read_table("users", version_as_of=v1)
    assert old.count() == 10


def test_projection_and_file_path(spark, catalog):
    create_users(catalog)
    catalog.write_to_table(users(spark, range(5)), "users", mode="append")
    out = catalog.read_table("users", columns=["name", "age"], file_path_column="src")
    assert out.columns == ["name", "age", "src"]
    assert all(r.src.endswith(".parquet") for r in out.collect())


def test_append_rejected_with_merge_keys(spark, catalog):
    schema = Schema(
        [
            Field("id", T.LongType(), merge_key=True),
            Field("name", T.StringType()),
            Field("age", T.IntegerType()),
            Field("city", T.StringType()),
        ]
    )
    catalog.create_table("users", schema=schema)
    with pytest.raises(SchemaError):
        catalog.write_to_table(users(spark, range(3)), "users", mode="append")


def test_truncate_keeps_definition(spark, catalog):
    create_users(catalog)
    catalog.write_to_table(users(spark, range(5)), "users", mode="append")
    catalog.truncate_table("users")
    assert catalog.read_table("users").count() == 0
    assert catalog.table_exists("users")


def test_rename_drop_namespaces(spark, catalog):
    catalog.write_to_table(users(spark, range(3)), "users", mode="auto")
    catalog.rename_table("users", "users2")
    assert catalog.list_tables() == ["users2"]
    assert catalog.read_table("users2").count() == 3
    catalog.drop_table("users2")
    with pytest.raises(TableNotFoundError):
        catalog.read_table("users2")
    catalog.create_namespace("ns2")
    assert "ns2" in catalog.list_namespaces()


def test_write_to_missing_table_errors(spark, catalog):
    with pytest.raises(TableNotFoundError):
        catalog.write_to_table(users(spark, range(3)), "nope", mode="append")


def test_auto_creates(spark, catalog):
    catalog.write_to_table(users(spark, range(3)), "users", mode="auto")
    assert catalog.read_table("users").count() == 3


def test_alter_table_schema_and_properties(spark, catalog):
    from pyspark.sql import types as T

    create_users(catalog)
    catalog.write_to_table(users(spark, range(3)), "users", mode="append")
    # add a column + change a property via ALTER (metadata-only commit)
    new_schema = Schema(
        [
            Field("id", T.LongType()),
            Field("name", T.StringType()),
            Field("age", T.IntegerType()),
            Field("city", T.StringType()),
            Field("email", T.StringType(), past_default="n/a"),
        ]
    )
    catalog.alter_table("users", schema=new_schema, properties={"owner": "me"})
    snap = catalog.snapshot("users")
    assert snap.properties["owner"] == "me"
    assert snap.schema.names[-1] == "email"
    # old rows read with the declared past_default
    rows = catalog.read_table("users").collect()
    assert all(r.email == "n/a" for r in rows)
    # evolution guard: ALTER cannot narrow a type
    import pytest as _pytest

    with _pytest.raises(SchemaError):
        catalog.alter_table(
            "users",
            schema=Schema([Field("age", T.StringType())]),
        )


def test_listing_pagination(spark, catalog):
    for name in ("alpha", "beta", "gamma", "delta"):
        catalog.write_to_table(users(spark, range(1)), name, mode="auto")
    page1 = catalog.list_tables(limit=2)
    assert page1 == ["alpha", "beta"]
    page2 = catalog.list_tables(limit=2, start_after=page1[-1])
    assert page2 == ["delta", "gamma"]
    assert catalog.list_tables(limit=2, start_after=page2[-1]) == []


def test_get_table_and_refresh(spark, catalog):
    from deltacat_spark.schema import Field, Schema
    from pyspark.sql import types as T

    assert catalog.get_table("absent") is None
    catalog.create_table(
        "gt",
        schema=Schema([Field("id", T.LongType(), merge_key=True)]),
        properties={"read_optimization": "max"},
    )
    catalog.write_to_table(
        spark.createDataFrame([(1,), (2,)], "id long"), "gt", mode="merge"
    )
    td = catalog.get_table("gt")
    assert td["table"] == "gt" and td["version"] >= 2
    assert td["n_records"] == 2 and td["schema"] is not None
    assert td["properties"]["read_optimization"] == "max"
    catalog.refresh_table("gt")  # no-op semantics; must not raise
    import pytest
    from deltacat_spark.catalog.catalog import TableNotFoundError

    with pytest.raises(TableNotFoundError):
        catalog.refresh_table("absent")


def test_namespace_get_alter_default(spark, catalog):
    assert catalog.default_namespace() == "default"
    assert catalog.get_namespace("nope") is None
    catalog.create_namespace("team_a", properties={"owner": "alice"})
    meta = catalog.get_namespace("team_a")
    assert meta["properties"]["owner"] == "alice"
    catalog.alter_namespace("team_a", properties={"tier": "gold"})
    meta = catalog.get_namespace("team_a")
    assert meta["properties"] == {"owner": "alice", "tier": "gold"}
    catalog.alter_namespace("team_a", new_namespace="team_b")
    assert catalog.get_namespace("team_a") is None
    assert catalog.get_namespace("team_b")["name"] == "team_b"
