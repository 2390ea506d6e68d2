"""Round-7 feature-intersection tests: the new SQL surface (generalized
MERGE, time travel, DDL, buffered REPLACE) crossed with the engine
machinery it sits on (MoR deltas, scoped OPTIMIZE, pause/resume, schema
evolution, bloom sidecars)."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.catalog.transaction import Transaction
from deltacat_spark.schema import Field, Schema


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "x7"))


def _users(cat, props=None):
    cat.create_table(
        "users",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("name", T.StringType()),
                Field("age", T.IntegerType()),
            ]
        ),
        properties=props,
    )
    cat.sql("INSERT INTO users VALUES (1, 'ann', 30), (2, 'bob', 40), (3, 'cy', 50)")


def test_generalized_merge_on_mor_table(cat, spark):
    """The predicated/column-SET MERGE path must compose with
    merge-on-read: the payload lands as a delta, reads resolve it."""
    _users(cat, props={"read_optimization": "none"})
    spark.createDataFrame(
        [(2, 5), (3, 7), (9, 1)], "id long, bump int"
    ).createOrReplaceTempView("x7b")
    cat.sql(
        "MERGE INTO users t USING (SELECT * FROM x7b) s ON t.id = s.id"
        " WHEN MATCHED AND t.age >= 50 THEN UPDATE SET age = t.age + s.bump"
    )
    got = {r.id: r.age for r in cat.read_table("users").collect()}
    assert got == {1: 30, 2: 40, 3: 57}
    from deltacat_spark.storage.commit import DeltaType

    snap = cat.snapshot("users")
    assert any(f.delta_type == DeltaType.UPSERT for f in snap.files)


def test_time_travel_across_scoped_optimize(cat, spark):
    from deltacat_spark.plans.transforms import PartitionKey

    cat.create_table(
        "pt",
        schema=Schema(
            [
                Field("cat", T.StringType(), merge_key=True),
                Field("k", T.LongType(), merge_key=True),
                Field("v", T.IntegerType()),
            ]
        ),
        partition_scheme=[PartitionKey("cat")],
        properties={"read_optimization": "none"},
    )
    cat.write_to_table(
        spark.createDataFrame(
            [("a", 1, 10), ("b", 2, 20)], "cat string, k long, v int"
        ),
        "pt",
        mode="merge",
    )
    v0 = cat.snapshot("pt").version
    cat.write_to_table(
        spark.createDataFrame([("a", 1, 99)], "cat string, k long, v int"),
        "pt",
        mode="merge",
    )
    cat.sql("OPTIMIZE pt WHERE cat = 'a'")
    # current state reads post-optimize; VERSION AS OF reads pre-upsert
    now = {(r.cat, r.k): r.v for r in cat.sql("SELECT * FROM pt").collect()}
    assert now == {("a", 1): 99, ("b", 2): 20}
    old = {
        (r.cat, r.k): r.v
        for r in cat.sql(f"SELECT * FROM pt VERSION AS OF {v0}").collect()
    }
    assert old == {("a", 1): 10, ("b", 2): 20}


def test_txn_overwrite_survives_pause_resume(cat, spark):
    _users(cat)
    txn = cat.transaction()
    txn.sql("INSERT OVERWRITE users VALUES (8, 'only', 10)")
    txn.sql("INSERT INTO users VALUES (9, 'post', 1)")
    txn_id = txn.pause()
    # nothing visible while paused
    assert cat.read_table("users").count() == 3
    resumed = Transaction.resume(cat, txn_id)
    assert {r.id for r in resumed.read("users").collect()} == {8, 9}
    resumed.seal()
    got = {r.id for r in cat.read_table("users").collect()}
    assert got == {8, 9}


def test_copy_into_evolves_schema(cat, spark, tmp_path):
    _users(cat)
    src = str(tmp_path / "wider.parquet")
    spark.createDataFrame(
        [(60, "new", 5, "x@y.z")], "id long, name string, age int, email string"
    ).write.parquet(src)
    cat.sql(f"COPY INTO users FROM '{src}'")
    out = cat.read_table("users")
    assert "email" in out.columns
    by_id = {r.id: r.email for r in out.collect()}
    assert by_id[60] == "x@y.z" and by_id[1] is None


def test_ddl_table_with_bloom_property_prunes(cat, spark):
    cat.sql(
        "CREATE TABLE pk (id BIGINT PRIMARY KEY, val STRING)"
        " TBLPROPERTIES ('bloom_filter_columns'='id', 'max_records_per_file'='25')"
    )
    cat.sql(
        "INSERT INTO pk SELECT id * 2 AS id, concat('v', id) AS val"
        " FROM range(100)"
    )
    snap = cat.snapshot("pk")
    with_bloom = [f for f in snap.files if f.bloom_ref]
    assert len(with_bloom) >= 2, "multi-file table with sidecars expected"
    kept = snap.prune(None, [("id", "=", 13)], fs=cat.fs)  # odd: nowhere
    assert len(kept) < len(with_bloom)
    live = snap.prune(None, [("id", "=", 26)], fs=cat.fs)
    assert live, "bloom must keep the file holding a live key"


def test_dropped_column_then_merge_sql(cat, spark):
    """Column drop followed by a MERGE whose source still carries the
    dropped column: AUTO evolution re-adds it as a NEW column; old rows
    read null (metadata-only drop never resurrects old file data)."""
    _users(cat)
    cat.sql("ALTER TABLE users DROP COLUMN name")
    spark.createDataFrame(
        [(2, "re", 41)], "id long, name string, age int"
    ).createOrReplaceTempView("x7d")
    cat.sql(
        "MERGE INTO users t USING (SELECT * FROM x7d) s ON t.id = s.id"
        " WHEN MATCHED THEN UPDATE SET *"
    )
    got = {r.id: (r.name, r.age) for r in cat.read_table("users").collect()}
    assert got[2] == ("re", 41)
    assert got[1] == (None, 30)
