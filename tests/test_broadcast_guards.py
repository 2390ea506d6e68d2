"""Size guards on the MoR read-path joins: delete sets broadcast only
when the commit log's record counts prove them small; larger sets fall
back to a shuffle join (driver-OOM safety at 100 TB scale)."""

import contextlib

from pyspark.sql import types as T

from deltacat_spark.plans.expr import col
from deltacat_spark.schema import Field, Schema


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextlib.contextmanager
def _no_auto_broadcast(spark):
    """Disable Spark's size-based auto-broadcast so the plan shows only
    OUR explicit hint (at real scale Spark's own estimator is also a
    valid reason to broadcast — here we test that the unconditional
    hint is gone)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pos_delete_join_broadcasts_when_small(spark, catalog):
    catalog.write_to_table(
        spark.createDataFrame([(i,) for i in range(20)], "id long"),
        "t", mode="auto",
    )
    catalog.delete_where("t", col("id").ge(15))
    plan = _plan(catalog.read_table("t"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_pos_delete_join_shuffles_when_large(spark, catalog):
    """broadcast.row_limit=1 makes the 5-row delete set 'large': the
    anti-join must not be a broadcast join."""
    catalog.write_to_table(
        spark.createDataFrame([(i,) for i in range(20)], "id long"),
        "t", mode="auto", properties={"broadcast.row_limit": 1},
    )
    catalog.delete_where("t", col("id").ge(15))
    with _no_auto_broadcast(spark):
        out = catalog.read_table("t")
        plan = _plan(out)
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert sorted(r.id for r in out.collect()) == list(range(15))


def test_mor_delete_fold_shuffles_when_large(spark, catalog):
    catalog.create_table(
        "m",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.LongType())]
        ),
        properties={"read_optimization": "none", "broadcast.row_limit": 1},
    )
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(10)], "id long, v long"),
        "m", mode="merge",
    )
    catalog.write_to_table(
        spark.createDataFrame([(i,) for i in range(8, 10)], "id long"),
        "m", mode="delete",
    )
    with _no_auto_broadcast(spark):
        out = catalog.read_table("m")
        plan = _plan(out)
        # The last-delete-per-key fold must not broadcast past the limit.
        assert "BroadcastHashJoin" not in plan
        assert sorted(r.id for r in out.collect()) == list(range(8))


def test_mor_delete_fold_broadcasts_when_small(spark, catalog):
    catalog.create_table(
        "m",
        schema=Schema(
            [Field("id", T.LongType(), merge_key=True), Field("v", T.LongType())]
        ),
        properties={"read_optimization": "none"},
    )
    catalog.write_to_table(
        spark.createDataFrame([(i, i) for i in range(10)], "id long, v long"),
        "m", mode="merge",
    )
    catalog.write_to_table(
        spark.createDataFrame([(9,)], "id long"), "m", mode="delete"
    )
    out = catalog.read_table("m")
    assert "BroadcastHashJoin" in _plan(out)
    assert sorted(r.id for r in out.collect()) == list(range(9))
