"""Iceberg non-identity partition transforms on WRITE
(`sources/iceberg.py`): spec-exact murmur3 bucket (Appendix B test
vectors), truncate, and temporal epoch-ordinal transforms — partition
tuples external readers prune on, metadata spec fields carrying the
spec transform strings, source columns kept in the data files.
"""

import datetime
import decimal
import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.iceberg import (
    IcebergTable,
    bucket_value,
    murmur3_32,
    parse_partition_term,
    read_iceberg,
    write_iceberg,
)


def test_murmur3_spec_vectors():
    """Appendix B publishes the expected bucket hashes."""
    import struct

    def signed(h):
        return h - (1 << 32) if h >= (1 << 31) else h

    assert signed(murmur3_32(struct.pack("<q", 34))) == 2017239379
    assert signed(murmur3_32(b"iceberg")) == 1210000089
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert signed(murmur3_32(struct.pack("<q", days))) == -653330422
    # decimal 14.20 hashes its minimal big-endian unscaled (1420)
    from deltacat_spark.sources.iceberg import bucket_hash_bytes

    assert signed(
        murmur3_32(bucket_hash_bytes("decimal(9, 2)", decimal.Decimal("14.20")))
    ) == -500754589


def test_parse_partition_terms():
    assert parse_partition_term("cat")["transform"] == "identity"
    b = parse_partition_term("bucket(16, id)")
    assert b == {
        "transform": "bucket[16]",
        "source": "id",
        "param": 16,
        "name": "id_bucket",
    }
    t = parse_partition_term("truncate(4, name)")
    assert t["transform"] == "truncate[4]" and t["name"] == "name_trunc"
    d = parse_partition_term("day(ts)")
    assert d == {
        "transform": "day",
        "source": "ts",
        "param": None,
        "name": "ts_day",
    }


def test_bucket_write_partitions_and_prunes(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 200).select(
        "id", (F.col("id") * 0.5).alias("v")
    )
    write_iceberg(df, root, partition_by=["bucket(4, id)"])
    # full read returns everything, source column intact
    back = read_iceberg(spark, root)
    assert back.columns == ["id", "v"]
    assert sorted(r.id for r in back.collect()) == list(range(200))
    # partition tuples carry the SPEC bucket values
    tbl = IcebergTable(root)
    data, _ = tbl.live_files()
    for f in data:
        b = f["partition"]["id_bucket"]
        assert isinstance(b, int) and 0 <= b < 4
    # metadata spec field is spec-shaped
    spec = tbl.metadata()["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "bucket[4]"
    assert spec["name"] == "id_bucket"
    # pruning: filter to one bucket returns exactly the matching keys
    want = [i for i in range(200) if bucket_value("long", i, 4) == 2]
    got = read_iceberg(spark, root, partition_filter={"id_bucket": 2})
    assert sorted(r.id for r in got.collect()) == want
    # file-level check: every kept file's rows ARE bucket 2
    kept = [
        f for f in data if f["partition"]["id_bucket"] == 2
    ]
    assert len(kept) >= 1


def test_bucket_matches_scalar_reference(spark, tmp_path):
    """The numpy-vectorized UDF must agree with the scalar spec
    implementation on every value, including negatives."""
    root = str(tmp_path / "t")
    df = spark.range(-50, 50).select("id")
    write_iceberg(df, root, partition_by=["bucket(8, id)"])
    data, _ = IcebergTable(root).live_files()
    # rebuild id -> bucket from the files themselves
    for f in data:
        b = f["partition"]["id_bucket"]
        ids = [
            r.id
            for r in read_iceberg(
                spark, root, partition_filter={"id_bucket": b}
            ).collect()
        ]
        for i in ids:
            assert bucket_value("long", i, 8) == b


def test_truncate_and_day_transforms(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [
            (-7, "alpha", datetime.date(1970, 1, 3)),
            (3, "alphabet", datetime.date(2020, 6, 1)),
            (14, "beta", datetime.date(2020, 6, 1)),
            (19, "be", datetime.date(1969, 12, 30)),
        ],
        "id long, name string, d date",
    )
    write_iceberg(
        df,
        root,
        partition_by=["truncate(10, id)", "truncate(3, name)", "day(d)"],
    )
    data, _ = IcebergTable(root).live_files()
    seen = {
        (
            f["partition"]["id_trunc"],
            f["partition"]["name_trunc"],
            f["partition"]["d_day"],
        )
        for f in data
    }
    assert (-10, "alp", 2) in seen  # -7 floors to -10; 1970-01-03 = day 2
    assert (0, "alp", 18414) in seen
    assert (10, "bet", 18414) in seen
    assert (10, "be", -2) in seen  # pre-epoch day ordinal is negative
    back = read_iceberg(spark, root)
    assert back.count() == 4
    assert set(back.columns) == {"id", "name", "d"}


def test_transformed_table_appends_without_partition_by(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(0, 40).select("id"),
        root,
        partition_by=["bucket(4, id)"],
    )
    write_iceberg(
        spark.range(40, 60).select("id"), root, mode="append"
    )  # spec reconstructed from metadata
    assert read_iceberg(spark, root).count() == 60
    data, _ = IcebergTable(root).live_files()
    assert all("id_bucket" in f["partition"] for f in data)
    # mismatched respecification is refused
    with pytest.raises(ValueError, match="partition terms"):
        write_iceberg(
            spark.range(3).select("id"),
            root,
            partition_by=["bucket(8, id)"],
        )


def test_mixed_identity_and_transform(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 60).select(
        "id",
        (F.col("id") % 3).cast("string").alias("cat"),
        (F.col("id") * 2.0).alias("v"),
    )
    write_iceberg(df, root, partition_by=["cat", "bucket(2, id)"])
    back = read_iceberg(spark, root)
    assert set(back.columns) == {"id", "cat", "v"}
    got = sorted((r.id, r.cat) for r in back.collect())
    assert got == [(i, str(i % 3)) for i in range(60)]
    # identity + transform filters compose
    want = [
        i
        for i in range(60)
        if i % 3 == 1 and bucket_value("long", i, 2) == 0
    ]
    got = read_iceberg(
        spark, root, partition_filter={"cat": "1", "id_bucket": 0}
    )
    assert sorted(r.id for r in got.collect()) == want
