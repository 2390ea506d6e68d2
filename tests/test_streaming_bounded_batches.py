"""The lakehouse streaming sources read file slices through the
Python DataSource API executor-side; peak memory must be bounded by
ONE parquet row group, never the whole file
(`streaming/lakehouse_source.py:_iter_row_group_tables`). These tests
rewrite a committed data file into many small row groups and drive
each reader's `read()` directly: the rows must be complete AND arrive
as multiple independent batches (proof the reader never materialized
the file at once)."""

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from deltacat_spark.streaming.lakehouse_source import (
    DeltaAppendsStreamReader,
    HudiIncrementalStreamReader,
    IcebergAppendsStreamReader,
)


def _shrink_row_groups(path: str, row_group_size: int = 40) -> int:
    """Rewrite a parquet file in place with tiny row groups; returns
    the new row-group count."""
    t = pq.read_table(path)
    pq.write_table(t, path, row_group_size=row_group_size)
    return pq.ParquetFile(path).metadata.num_row_groups


def _drain(reader, start, end):
    batches = []
    for p in reader.partitions(start, end):
        batches.extend(reader.read(p))
    return batches


def test_hudi_stream_reader_bounded_batches(spark, tmp_path):
    from deltacat_spark.sources.hudi import file_slices, write_hudi

    root = str(tmp_path / "t")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    write_hudi(
        df.coalesce(1), root, record_key_field="k", operation="insert"
    )
    s = file_slices(root)[0]
    n_groups = _shrink_row_groups(os.path.join(root, s["path"]))
    assert n_groups > 3

    reader = HudiIncrementalStreamReader({"root": root, "from_instant": ""})
    batches = _drain(
        reader, reader.initialOffset(), reader.latestOffset()
    )
    assert sum(b.num_rows for b in batches) == 500
    assert len(batches) >= n_groups  # one-or-more batches PER row group
    assert max(b.num_rows for b in batches) <= 40


def test_delta_stream_reader_bounded_batches(spark, tmp_path):
    from deltacat_spark.sources.deltalake import DeltaSnapshot, write_delta

    root = str(tmp_path / "t")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    write_delta(df.coalesce(1), root)
    live = DeltaSnapshot(root).live_files()
    assert len(live) == 1
    n_groups = _shrink_row_groups(os.path.join(root, live[0]["path"]))
    assert n_groups > 3

    reader = DeltaAppendsStreamReader({"root": root})
    batches = _drain(
        reader, reader.initialOffset(), reader.latestOffset()
    )
    assert sum(b.num_rows for b in batches) == 500
    assert len(batches) >= n_groups
    assert max(b.num_rows for b in batches) <= 40


def test_iceberg_stream_reader_bounded_batches(spark, tmp_path):
    from deltacat_spark.sources.iceberg import IcebergTable, write_iceberg

    root = str(tmp_path / "t")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    write_iceberg(df.coalesce(1), root)
    data, _ = IcebergTable(root).live_files()
    assert len(data) == 1
    n_groups = _shrink_row_groups(os.path.join(root, data[0]["file_path"]))
    assert n_groups > 3

    reader = IcebergAppendsStreamReader({"root": root})
    batches = _drain(
        reader, reader.initialOffset(), reader.latestOffset()
    )
    assert sum(b.num_rows for b in batches) == 500
    assert len(batches) >= n_groups
    assert max(b.num_rows for b in batches) <= 40
