"""The unsplittable-small-scan spread gate (workloads/base.py, r15
optimization): compute-heavy rows opt in via load(..., spread=True);
the gate must fire only when BOTH data-derived conditions hold —
input smaller than one scan split AND fewer files than half the
default parallelism — and must never change row contents."""

import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.workloads.base import _spread_small_scan, load

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
class TestSpreadGate:
    def test_small_single_file_spreads(self, spark):
        plain = load(spark, SF_DIR, "documents")
        spread = load(spark, SF_DIR, "documents", spread=True)
        par = spark.sparkContext.defaultParallelism
        if par == 1:
            pytest.skip("single-core runner: plain scan already == par")
        assert plain.rdd.getNumPartitions() < par
        assert spread.rdd.getNumPartitions() == par

    def test_rows_identical(self, spark):
        plain = load(spark, SF_DIR, "documents").collect()
        spread = load(spark, SF_DIR, "documents", spread=True).collect()
        key = lambda r: r.doc_id  # noqa: E731
        assert sorted(plain, key=key) == sorted(spread, key=key)

    def test_events_ts_normalization_preserved(self, spark):
        ev = load(spark, SF_DIR, "events", spread=True)
        assert "ts_us" in ev.columns and "ts" not in ev.columns

    def test_many_file_input_left_alone(self, spark, tmp_path):
        # a directory with >= par/2 part files already scans wide — the
        # round-robin exchange would be pure cost, so the gate must not
        # fire even though the total size is tiny
        par = spark.sparkContext.defaultParallelism
        n_files = max(2, par // 2)
        out = str(tmp_path / "many")
        spark.range(1000).repartition(n_files).write.parquet(out)
        df = spark.read.parquet(out)
        assert _spread_small_scan(spark, df, out) is df

    def test_tb_suffix_parses(self, spark, tmp_path):
        # ADVICE r15: '1t'/'1tb'/'1p' suffixes must not raise inside load()
        out = str(tmp_path / "one_t")
        spark.range(100).coalesce(1).write.parquet(out)
        df = spark.read.parquet(out)
        old = spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        try:
            for v in ("1t", "1tb", "1p"):
                spark.conf.set("spark.sql.files.maxPartitionBytes", v)
                _spread_small_scan(spark, df, out)  # must not raise
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    def test_partitioned_dir_left_alone(self, spark, tmp_path):
        # ADVICE r15: hive-partitioned subdirs size wrong via getsize —
        # the gate must stay off for partitioned layouts
        out = str(tmp_path / "parts")
        spark.range(100).withColumn("p", F.col("id") % 2).write.partitionBy(
            "p"
        ).parquet(out)
        df = spark.read.parquet(out)
        assert _spread_small_scan(spark, df, out) is df

    def test_large_input_left_alone(self, spark, tmp_path, monkeypatch):
        # force a tiny max split so the size condition fails
        out = str(tmp_path / "one")
        spark.range(100).coalesce(1).write.parquet(out)
        df = spark.read.parquet(out)
        old = spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1b")
        try:
            assert _spread_small_scan(spark, df, out) is df
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
