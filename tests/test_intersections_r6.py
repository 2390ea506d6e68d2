"""Round-6 feature-INTERSECTION probes (the round-5 cross-axis habit that
keeps finding real bugs): transaction × partial-payload deltas, CDC ×
partial payload, stream sink × schema evolution across restarts."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

SCHEMA = Schema(
    [
        Field("id", T.LongType(), merge_key=True),
        Field("name", T.StringType()),
        Field("v", T.IntegerType()),
    ]
)


def _full(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, v int")


def _partial(spark, rows):
    return spark.createDataFrame(rows, "id long, v int")


# -- transaction × partial deltas -------------------------------------


@pytest.mark.parametrize("read_opt", ["max", "none"], ids=["cow", "mor"])
def test_txn_partial_merge_read_your_writes(spark, tmp_path, read_opt):
    c = Catalog(spark, str(tmp_path / read_opt))
    c.create_table(
        "t", schema=SCHEMA, properties={"read_optimization": read_opt}
    )
    c.write_to_table(_full(spark, [(1, "a", 10), (2, "b", 20)]), "t", mode="merge")

    txn = c.transaction()
    txn.write(_partial(spark, [(1, 11), (3, 33)]), "t", mode="merge")
    # read-your-writes preview must stitch the partial payload: name
    # survives for id=1, id=3 inserts with name NULL
    preview = {r.id: (r.name, r.v) for r in txn.read("t").collect()}
    assert preview == {1: ("a", 11), 2: ("b", 20), 3: (None, 33)}
    txn.seal()
    # sealed state equals the preview exactly
    got = {r.id: (r.name, r.v) for r in c.read_table("t").collect()}
    assert got == preview


def test_txn_mid_txn_schema_evolution_preview(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "evo"))
    c.create_table("t", schema=SCHEMA)
    c.write_to_table(_full(spark, [(1, "a", 10)]), "t", mode="merge")
    txn = c.transaction()
    wide = spark.createDataFrame(
        [(2, "b", 20, "extra")], "id long, name string, v int, note string"
    )
    txn.write(wide, "t", mode="merge")
    preview = {
        r.id: (r.name, r.v, r.note) for r in txn.read("t").collect()
    }
    assert preview == {1: ("a", 10, None), 2: ("b", 20, "extra")}
    txn.seal()
    got = {r.id: (r.name, r.v, r.note) for r in c.read_table("t").collect()}
    assert got == preview


# -- CDC × partial payload --------------------------------------------


def test_cdc_partial_payload_stamps_change_cols(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cdc"))
    c.create_table(
        "t", schema=SCHEMA, properties={"read_optimization": "none"}
    )
    c.write_to_table(_full(spark, [(1, "a", 10)]), "t", mode="merge")
    v0 = c.snapshot("t").version
    c.write_to_table(_partial(spark, [(1, 11)]), "t", mode="merge")
    c.write_to_table(_full(spark, [(2, "b", 20)]), "t", mode="merge")

    changes = c.read_changes("t", from_version=v0).collect()
    by_id = {r.id: r for r in changes}
    # documented decision: the partial change row is the WRITTEN form —
    # name is NULL, and _change_cols says name was NOT carried
    assert by_id[1].v == 11 and by_id[1].name is None
    assert sorted(by_id[1]._change_cols.split(",")) == ["id", "v"]
    # full-row change rows carry no _change_cols stamp
    assert by_id[2]._change_cols is None


# -- stream sink × schema evolution mid-stream ------------------------


def test_stream_sink_schema_evolution_across_batches(spark, tmp_path):
    from deltacat_spark.streaming.api import make_stream_sink

    c = Catalog(spark, str(tmp_path / "sink"))
    sink = make_stream_sink(c, "s")
    sink(spark.createDataFrame([(1, "x")], "id long, name string"), 0)
    # a later deployment of the stream adds a column — AUTO evolution
    # must widen the table, not crash the sink
    sink(
        spark.createDataFrame(
            [(2, "y", 3.5)], "id long, name string, score double"
        ),
        1,
    )
    got = {
        r.id: (r.name, r.score)
        for r in c.read_table("s").collect()
    }
    assert got == {1: ("x", None), 2: ("y", 3.5)}
    # idempotence survives evolution: replaying batch 1 is a no-op
    sink(
        spark.createDataFrame(
            [(2, "y", 3.5)], "id long, name string, score double"
        ),
        1,
    )
    assert c.read_table("s").count() == 2
