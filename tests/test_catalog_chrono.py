"""F4 `events_chrono` golden tests: CHRONO out-of-order event time,
stream positions = event-time micros, watermark monotonicity, merge-order
field precedence over arrival order (FIXTURES.md F4; reference
`test_default_catalog_impl.py:2736-3289,4346-4770`)."""

import datetime

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema


def ts(s):
    return datetime.datetime.fromisoformat(s)


EVENTS = Schema(
    [
        Field("event_id", T.LongType()),
        Field("ts", T.TimestampNTZType(), event_time=True),
        Field("value", T.DoubleType()),
    ]
)


def batch(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, value double")


def test_chrono_out_of_order_positions_and_watermark(spark, catalog):
    catalog.create_table("ev", schema=EVENTS)
    catalog.write_to_table(
        batch(spark, [(1, ts("2024-01-02T00:00:00"), 1.0)]), "ev", mode="chrono"
    )
    snap1 = catalog.snapshot("ev")
    # stream position = event-time unix micros (reference
    # `catalog/main/impl.py:603-624`)
    expect = int(
        ts("2024-01-02T00:00:00").replace(tzinfo=datetime.timezone.utc).timestamp()
        * 1_000_000
    )
    assert snap1.commits[-1].stream_position == expect
    # late batch (earlier event time) is accepted
    catalog.write_to_table(
        batch(spark, [(2, ts("2024-01-01T00:00:00"), 2.0)]), "ev", mode="chrono"
    )
    snap2 = catalog.snapshot("ev")
    assert snap2.commits[-1].stream_position < expect
    # watermark never regresses (reference `stream.py:98-103`)
    assert snap2.watermark == snap1.watermark == expect
    assert catalog.read_table("ev").count() == 2


def test_chrono_requires_event_time(spark, catalog):
    from deltacat_spark.schema import SchemaError

    catalog.create_table(
        "noet",
        schema=Schema([Field("id", T.LongType()), Field("v", T.DoubleType())]),
    )
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(SchemaError):
        catalog.write_to_table(df, "noet", mode="chrono")


MERGE_ORDER_SCHEMA = Schema(
    [
        Field("event_id", T.LongType(), merge_key=True),
        Field("ts", T.TimestampNTZType(), event_time=True),
        Field("seq", T.LongType(), merge_order=("desc", "last")),
        Field("value", T.DoubleType()),
    ]
)


def mo_batch(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, seq long, value double"
    )


@pytest.mark.parametrize("ro", ["max", "none"])
def test_merge_order_beats_arrival_order(spark, tmp_path, ro):
    """Explicit merge_order field picks the winner even when a lower-seq
    row arrives later (reference precedence test
    `test_default_catalog_impl.py:4643`)."""
    c = Catalog(spark, str(tmp_path / f"mo_{ro}"))
    c.create_table("ev", schema=MERGE_ORDER_SCHEMA, properties={"read_optimization": ro})
    c.write_to_table(
        mo_batch(spark, [(1, ts("2024-01-01T00:00:00"), 10, 1.0)]), "ev", mode="merge"
    )
    # arrives later but lower seq → must NOT win
    c.write_to_table(
        mo_batch(spark, [(1, ts("2024-01-05T00:00:00"), 5, 2.0)]), "ev", mode="merge"
    )
    rowsv = c.read_table("ev").collect()
    assert len(rowsv) == 1
    assert rowsv[0].seq == 10 and rowsv[0].value == 1.0


@pytest.mark.parametrize("ro", ["max", "none"])
def test_event_time_is_default_merge_order(spark, tmp_path, ro):
    """Without explicit merge_order, the event-time field decides
    (reference `test_default_catalog_impl.py:4544`)."""
    schema = Schema(
        [
            Field("event_id", T.LongType(), merge_key=True),
            Field("ts", T.TimestampNTZType(), event_time=True),
            Field("value", T.DoubleType()),
        ]
    )
    c = Catalog(spark, str(tmp_path / f"et_{ro}"))
    c.create_table("ev", schema=schema, properties={"read_optimization": ro})
    c.write_to_table(
        batch(spark, [(1, ts("2024-01-09T00:00:00"), 1.0)]), "ev", mode="merge"
    )
    # later arrival, older event time → loses
    c.write_to_table(
        batch(spark, [(1, ts("2024-01-03T00:00:00"), 2.0)]), "ev", mode="merge"
    )
    rowsv = c.read_table("ev").collect()
    assert len(rowsv) == 1 and rowsv[0].value == 1.0


def test_chrono_on_partitioned_table(spark, catalog):
    """CHRONO stream positions + partitioned layout together: commits
    stamp event-time positions while files land under partition dirs."""
    from deltacat_spark.plans.transforms import PartitionKey
    from pyspark.sql import types as T

    schema = Schema(
        [
            Field("event_id", T.LongType()),
            Field("ts", T.TimestampNTZType(), event_time=True),
            Field("kind", T.StringType()),
        ]
    )
    catalog.create_table(
        "pev", schema=schema, partition_scheme=[PartitionKey("kind")]
    )
    catalog.write_to_table(
        spark.createDataFrame(
            [
                (1, ts("2024-01-02T00:00:00"), "a"),
                (2, ts("2024-01-02T01:00:00"), "b"),
            ],
            "event_id long, ts timestamp_ntz, kind string",
        ),
        "pev",
        mode="chrono",
    )
    snap = catalog.snapshot("pev")
    assert snap.commits[-1].stream_position is not None
    assert any((f.partition_values or {}).get("kind") == "a" for f in snap.files)
    assert catalog.read_table("pev").count() == 2
    # partition pruning works on the chrono table
    pruned = snap.prune({"kind": "a"}, None)
    assert len(pruned) < len(snap.files)


def test_chrono_optimize_preserves_watermark_and_content(spark, catalog):
    """OPTIMIZE (full and partition-scoped) over a CHRONO table must
    keep content and the monotone watermark — the fold rewrites files
    but event-time semantics live in the column, not the file layout."""
    from deltacat_spark.plans.transforms import PartitionKey

    part_events = Schema(
        [
            Field("cat", T.StringType()),
            Field("event_id", T.LongType()),
            Field("ts", T.TimestampNTZType(), event_time=True),
            Field("value", T.DoubleType()),
        ]
    )
    catalog.create_table(
        "evp", schema=part_events, partition_scheme=[PartitionKey("cat")]
    )

    def pbatch(rows):
        return spark.createDataFrame(
            rows, "cat string, event_id long, ts timestamp_ntz, value double"
        )

    catalog.write_to_table(
        pbatch([("a", 1, ts("2024-01-02T00:00:00"), 1.0),
                ("b", 2, ts("2024-01-03T00:00:00"), 2.0)]),
        "evp",
        mode="chrono",
    )
    catalog.write_to_table(
        pbatch([("a", 3, ts("2024-01-01T00:00:00"), 3.0)]), "evp", mode="chrono"
    )
    wm = catalog.snapshot("evp").watermark
    content = sorted(
        (r.cat, r.event_id, r.value)
        for r in catalog.read_table("evp").collect()
    )
    catalog.optimize_table("evp", partition_filter={"cat": "a"})
    snap = catalog.snapshot("evp")
    assert snap.watermark == wm
    assert sorted(
        (r.cat, r.event_id, r.value)
        for r in catalog.read_table("evp").collect()
    ) == content
    catalog.optimize_table("evp")
    snap2 = catalog.snapshot("evp")
    assert snap2.watermark == wm
    assert sorted(
        (r.cat, r.event_id, r.value)
        for r in catalog.read_table("evp").collect()
    ) == content
