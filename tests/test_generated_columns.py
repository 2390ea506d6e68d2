"""Delta-style generated columns: computed when omitted, validated when
provided, partition-prunable, DDL round-trippable."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.plans.transforms import PartitionKey
from deltacat_spark.schema import Field, Schema, SchemaError


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "gencol"))


def _mk(cat, partitioned=False):
    cat.create_table(
        "ev",
        schema=Schema(
            [
                Field("id", T.LongType()),
                Field("ts", T.StringType()),
                Field(
                    "day",
                    T.StringType(),
                    generated_expr="substring(ts, 1, 10)",
                ),
            ]
        ),
        partition_scheme=[PartitionKey("day")] if partitioned else None,
    )


def test_generated_computed_when_omitted(cat, spark):
    _mk(cat)
    df = spark.createDataFrame(
        [(1, "2026-03-01 10:00:00"), (2, "2026-03-02 11:00:00")],
        "id long, ts string",
    )
    cat.write_to_table(df, "ev", mode="append")
    got = {r.id: r.day for r in cat.read_table("ev").collect()}
    assert got == {1: "2026-03-01", 2: "2026-03-02"}


def test_generated_validated_when_provided(cat, spark):
    _mk(cat)
    ok = spark.createDataFrame(
        [(1, "2026-03-01 10:00:00", "2026-03-01")], "id long, ts string, day string"
    )
    cat.write_to_table(ok, "ev", mode="append")
    bad = spark.createDataFrame(
        [(2, "2026-03-02 10:00:00", "2026-01-01")], "id long, ts string, day string"
    )
    with pytest.raises(SchemaError, match="generated column 'day'"):
        cat.write_to_table(bad, "ev", mode="append")
    assert cat.read_table("ev").count() == 1


def test_generated_partition_column_prunes(cat, spark):
    _mk(cat, partitioned=True)
    df = spark.createDataFrame(
        [(i, f"2026-03-0{1 + i % 3} 10:00:00") for i in range(12)],
        "id long, ts string",
    )
    cat.write_to_table(df, "ev", mode="append")
    rows = cat.read_table(
        "ev", partition_filter={"day": "2026-03-02"}
    ).collect()
    assert {r.day for r in rows} == {"2026-03-02"}
    assert len(rows) == 4


def test_generated_sql_ddl_roundtrip(cat):
    cat.sql(
        "CREATE TABLE g (id BIGINT, ts STRING, "
        "day STRING GENERATED ALWAYS AS (substring(ts, 1, 10)))"
    )
    assert (
        cat.snapshot("g").schema.field("day").generated_expr
        == "substring(ts, 1, 10)"
    )
    cat.sql("INSERT INTO g (id, ts) VALUES (7, '2026-04-05 09:00:00')")
    assert cat.sql("SELECT day FROM g").collect()[0].day == "2026-04-05"
    ddl = cat.sql("SHOW CREATE TABLE g").collect()[0].create_statement
    assert "GENERATED ALWAYS AS (substring(ts, 1, 10))" in ddl
    # the emitted DDL re-creates an equivalent table
    cat.sql(ddl.replace("CREATE TABLE g", "CREATE TABLE g2"))
    assert (
        cat.snapshot("g2").schema.field("day").generated_expr
        == "substring(ts, 1, 10)"
    )
