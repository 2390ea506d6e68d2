"""Inclusive projection of source-column predicates onto partition
transforms (`read_iceberg(predicate_filter=)` / `project_predicates`) —
spec §Scan Planning. Reference reaches this via pyiceberg's scan
planning (`experimental/storage/iceberg/`); here it is the scalar
transform mirror (`transform_value`) applied to manifest partition
tuples, metadata-only and never a wrong prune.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.iceberg import (
    bucket_value,
    project_predicates,
    read_iceberg,
    transform_value,
    write_iceberg,
)


# ---------------------------------------------------------------------------
# scalar transform vectors
# ---------------------------------------------------------------------------


def test_transform_value_truncate():
    assert transform_value("truncate[10]", "long", 37) == 30
    assert transform_value("truncate[10]", "int", -3) == -10  # spec: floor
    assert transform_value("truncate[3]", "string", "iceberg") == "ice"
    assert transform_value("truncate[5]", "string", "ab") == "ab"


def test_transform_value_temporal():
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
    # spec example ordinals for 2017-11-16T22:31:08
    assert transform_value("year", "timestamp", ts) == 47
    assert transform_value("month", "timestamp", ts) == 574
    assert transform_value("day", "timestamp", ts) == 17486
    assert transform_value("hour", "timestamp", ts) == 17486 * 24 + 22
    d = datetime.date(2017, 11, 16)
    assert transform_value("year", "date", d) == 47
    assert transform_value("month", "date", d) == 574
    assert transform_value("day", "date", d) == 17486
    # pre-epoch floors, not truncates-toward-zero
    old = datetime.datetime(1969, 12, 31, 23, 0, 0)
    assert transform_value("day", "timestamp", old) == -1
    assert transform_value("hour", "timestamp", old) == -1


def test_transform_value_bucket_matches_spec_vector():
    # Appendix B: bucket hash of int/long 34 = 2017239379
    assert transform_value("bucket[16]", "long", 34) == 2017239379 % 16


def test_project_predicates_shapes():
    meta = {
        "schemas": [
            {
                "type": "record",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "type": "long"},
                    {"id": 2, "name": "s", "type": "string"},
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": 1,
                        "field-id": 1000,
                        "name": "k_bucket",
                        "transform": "bucket[8]",
                    },
                    {
                        "source-id": 2,
                        "field-id": 1001,
                        "name": "s_trunc",
                        "transform": "truncate[2]",
                    },
                ],
            }
        ],
        "default-spec-id": 0,
    }
    eq = project_predicates(meta, {"k": 42, "s": "hello"})
    assert ("k_bucket", bucket_value("long", 42, 8), bucket_value("long", 42, 8)) in eq
    assert ("s_trunc", "he", "he") in eq
    # range through bucket: skipped (not order-preserving); through
    # truncate: projected
    rg = project_predicates(meta, {"k": (10, 20), "s": ("aa", "cz")})
    names = [c[0] for c in rg]
    assert "k_bucket" not in names
    assert ("s_trunc", "aa", "cz") in rg
    with pytest.raises(ValueError, match="None"):
        project_predicates(meta, {"k": None})


# ---------------------------------------------------------------------------
# end-to-end pruning == row-filter truth
# ---------------------------------------------------------------------------


def test_bucket_point_lookup_prunes_exactly(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_iceberg(df, root, partition_by=["bucket(8, k)"])
    for probe in (0, 17, 93, 199):
        got = sorted(
            r.k
            for r in read_iceberg(
                spark, root, predicate_filter={"k": probe}
            ).collect()
        )
        want = sorted(
            k
            for k in range(200)
            if bucket_value("long", k, 8) == bucket_value("long", probe, 8)
        )
        assert got == want
        assert len(got) < 200  # actually pruned


def test_truncate_range_prunes(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(100).select(F.col("id").alias("k"))
    write_iceberg(df, root, partition_by=["truncate(10, k)"])
    got = sorted(
        r.k
        for r in read_iceberg(
            spark, root, predicate_filter={"k": (23, 41)}
        ).collect()
    )
    # inclusive metadata-only prune: whole surviving buckets 20..40
    assert got == list(range(20, 50))
    # open-ended range
    got_hi = sorted(
        r.k
        for r in read_iceberg(
            spark, root, predicate_filter={"k": (85, None)}
        ).collect()
    )
    assert got_hi == list(range(80, 100))


def test_day_transform_range_prunes(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.sql(
        "SELECT id, timestamp'2024-01-01 00:00:00' + "
        "make_interval(0, 0, 0, CAST(id AS INT)) AS ts FROM range(30)"
    )
    write_iceberg(df, root, partition_by=["day(ts)"])
    lo = datetime.datetime(2024, 1, 10, 5, 0, 0)
    hi = datetime.datetime(2024, 1, 14, 23, 0, 0)
    got = sorted(
        r.id
        for r in read_iceberg(
            spark, root, predicate_filter={"ts": (lo, hi)}
        ).collect()
    )
    assert got == list(range(9, 14))  # days 2024-01-10 .. 2024-01-14


def test_projection_composes_with_identity_and_filters(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(120).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("cat"),
    )
    write_iceberg(df, root, partition_by=["cat", "bucket(4, k)"])
    got = sorted(
        r.k
        for r in read_iceberg(
            spark,
            root,
            predicate_filter={"k": 7, "cat": "1"},
        ).collect()
    )
    want = sorted(
        k
        for k in range(120)
        if k % 3 == 1
        and bucket_value("long", k, 4) == bucket_value("long", 7, 4)
    )
    assert got == want


def test_unprojectable_predicate_never_wrong_prunes(spark, tmp_path):
    """A predicate on a column outside every spec field must not prune
    anything."""
    root = str(tmp_path / "t")
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    write_iceberg(df, root, partition_by=["bucket(4, k)"])
    got = read_iceberg(
        spark, root, predicate_filter={"v": 9}
    ).count()
    assert got == 50
    # range over the bucketed source: also no prune (not order-preserving)
    got2 = read_iceberg(
        spark, root, predicate_filter={"k": (10, 20)}
    ).count()
    assert got2 == 50
