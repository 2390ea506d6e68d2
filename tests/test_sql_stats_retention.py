"""SQL-over-catalog, table stats, retention vacuum, streaming table
reads."""

import pytest
from pyspark.sql import functions as F

from deltacat_spark.streaming.api import stream_read_appends


def test_sql_over_catalog_tables(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        "t1",
        mode="auto",
    )
    catalog.write_to_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, x double"),
        "t2",
        mode="auto",
    )
    out = catalog.sql(
        "SELECT t1.id, v, x FROM t1 JOIN t2 ON t1.id = t2.id ORDER BY t1.id"
    )
    rows = out.collect()
    assert [(r.id, r.v, r.x) for r in rows] == [(1, "a", 10.0), (2, "b", 20.0)]


def test_sql_registers_only_referenced_tables(spark, catalog, monkeypatch):
    for name in ("t1", "t2", "t3"):
        catalog.write_to_table(
            spark.createDataFrame([(1,)], "id long"), name, mode="auto"
        )
    resolved = []
    orig = catalog.snapshot

    def counting(table, *a, **kw):
        resolved.append(table)
        return orig(table, *a, **kw)

    monkeypatch.setattr(catalog, "snapshot", counting)
    out = catalog.sql("SELECT count(*) AS n FROM t2")
    assert out.collect()[0].n == 1
    # Only the referenced table paid a snapshot resolution.
    assert set(resolved) == {"t2"}


def test_table_stats(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(i,) for i in range(10)], "id long"), "t", mode="auto"
    )
    st = catalog.table_stats("t")
    assert st["records"] == 10 and st["files"] >= 1 and st["version"] >= 2
    assert st["unresolved_deltas"] == 0


def test_retention_vacuum_expires_old_versions(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t", mode="auto"
    )
    for i in range(4):
        catalog.write_to_table(
            spark.createDataFrame([(i + 10,)], "id long"), "t", mode="replace"
        )
    v_old = 2  # first data version
    assert catalog.read_table("t", version_as_of=v_old).count() == 1
    removed = catalog.vacuum("t", retain_versions=1, min_age_seconds=0)
    assert removed > 0
    # current read unaffected
    assert catalog.read_table("t").count() == 1
    # time travel beyond retention no longer resolves (files gone)
    with pytest.raises(Exception):
        catalog.read_table("t", version_as_of=v_old).collect()


def test_stream_read_appends(spark, catalog, tmp_path):
    catalog.write_to_table(
        spark.createDataFrame([(1,), (2,)], "id long"), "t", mode="auto"
    )
    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            stream_read_appends(catalog, "t")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(sink).count() == 2
    # more appends → incremental restart picks up only the new files
    catalog.write_to_table(
        spark.createDataFrame([(3,)], "id long"), "t", mode="append"
    )
    run_once()
    assert sorted(r.id for r in spark.read.parquet(sink).collect()) == [1, 2, 3]


def test_stream_read_rejects_cow_tables(spark, catalog):
    from pyspark.sql import types as T

    from deltacat_spark.schema import Field, Schema

    catalog.create_table(
        "m",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.LongType())]
        ),
    )
    catalog.write_to_table(
        spark.createDataFrame([(1, 1)], "id long, v long"), "m", mode="merge"
    )
    with pytest.raises(ValueError):
        stream_read_appends(catalog, "m")


def test_analyze_table_column_stats(spark, catalog):
    from deltacat_spark.schema import Field, Schema
    from pyspark.sql import types as T

    catalog.create_table(
        "an",
        schema=Schema(
            [Field("id", T.LongType()), Field("grp", T.StringType())]
        ),
    )
    df = spark.range(1000).select(
        "id",
        F.when(F.col("id") % 10 < 9, (F.col("id") % 7).cast("string")).alias(
            "grp"
        ),
    )
    catalog.write_to_table(df, "an", mode="append")
    stats = catalog.analyze_table("an")
    assert stats["rows"] == 1000
    assert stats["columns"]["grp"]["nulls"] == 100
    # HLL++ at rsd=0.05: exact NDVs are 1000 and 7
    assert abs(stats["columns"]["id"]["ndv"] - 1000) <= 100
    assert stats["columns"]["grp"]["ndv"] == 7
    # surfaced from the log alone (new snapshot, no data scan)
    ts = catalog.table_stats("an")
    assert ts["column_stats"]["rows"] == 1000
    assert ts["column_stats"]["columns"]["grp"]["nulls"] == 100
    # an ANALYZE commit must not disturb the live file set
    assert catalog.read_table("an").count() == 1000
