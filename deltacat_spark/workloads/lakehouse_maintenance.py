"""Lakehouse MAINTENANCE driver rows — compaction / clustering /
vacuum round-trips for the jar-free Iceberg, Delta and Hudi tables,
oracle-checked end to end.

Reference parity: the reference's compaction session rewrites a
partition's delta files and commits the result
(`compute/compactor_v2/compaction_session.py`), and its janitor
removes unreferenced files (`catalog/main/impl.py` garbage collection).
These rows prove the same maintenance motions on the three external
table formats preserve EXACTLY the committed rows:

* a broken OPTIMIZE/cluster/rewrite that drops or duplicates rows,
* a vacuum/cleaner that deletes a live file,
* a replacecommit that disturbs per-row origin commit times (Hudi
  incremental exactness),

all surface as value-hash mismatches against a DuckDB oracle computed
from the source parquet alone.

Scale shape: maintenance is ONE fanout Spark job per table (every
eligible partition compacts in the same stage — no per-partition
driver loop), plus O(files) driver-side control plane, the identical
cost profile to the catalog's own `optimize_table`. Temp tables are
keyed-modulo subsets of the input, never copies.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import cnt, cnt_sql, dsum, dsum_sql, load


def delta_optimize_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three small-file appends into a partitioned Delta table, then
    OPTIMIZE (bin-pack: adds+removes with dataChange=false) and a
    VACUUM down to the latest version's live set — the read must see
    exactly the union of the appends through the compacted files."""
    from deltacat_spark.sources.deltalake import (
        optimize_delta,
        read_delta,
        vacuum_delta,
    )

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    root = tempfile.mkdtemp(prefix="delta_opt_")
    for m in (0, 1, 2):  # three appends -> >=3 files per partition
        from deltacat_spark.sources.deltalake import write_delta

        write_delta(
            c.filter(F.col("c_custkey") % 7 == m),
            root,
            partition_by=["c_mktsegment"],
        )
    assert optimize_delta(spark, root) is not None
    vacuum_delta(root, keep_versions=1)
    latest = read_delta(spark, root)
    return (
        latest.groupBy("c_mktsegment")
        .agg(cnt("n"), dsum("c_acctbal", "balance"))
        .orderBy("c_mktsegment")
    )


DELTA_OPTIMIZE_SQL = f"""
SELECT c_mktsegment, {cnt_sql("n")}, {dsum_sql("c_acctbal", "balance")}
FROM customer
WHERE c_custkey % 7 IN (0, 1, 2)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def hudi_cluster_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert + upsert into a partitioned Hudi CoW table, CLUSTER it
    (replacecommit collapses each partition's file groups), then read
    BOTH the post-clustering snapshot and an incremental pull since the
    first commit. Clustering is a reorganization: the snapshot must see
    the merged groups' rows exactly once, and the incremental pull must
    be untouched by it (original per-row commit times preserved, the
    replacecommit itself contributes no rows)."""
    from deltacat_spark.sources.hudi import (
        cluster_hudi,
        read_hudi,
        read_hudi_incremental,
        write_hudi,
    )

    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    root = tempfile.mkdtemp(prefix="hudi_clu_")
    i1 = write_hudi(
        p.filter(F.col("p_partkey") % 20 == 0),
        root,
        record_key_field="p_partkey",
        operation="insert",
        partition_by=["p_brand"],
    )
    updates = p.filter(F.col("p_partkey") % 40 == 0).withColumn(
        "p_retailprice", F.col("p_retailprice") + F.lit(100.0)
    )
    new_keys = p.filter(F.col("p_partkey") % 20 == 10)
    write_hudi(
        updates.unionByName(new_keys), root, record_key_field="p_partkey"
    )
    assert cluster_hudi(spark, root) is not None
    snap = read_hudi(spark, root, drop_meta=True)
    inc = read_hudi_incremental(spark, root, begin_instant=i1, drop_meta=True)
    out = [
        df.groupBy("p_brand")
        .agg(cnt("n"), dsum("p_retailprice", "total"))
        .withColumn("phase", F.lit(phase))
        for phase, df in (("snapshot", snap), ("incremental", inc))
    ]
    return (
        out[0]
        .unionByName(out[1])
        .select("phase", "p_brand", "n", "total")
        .orderBy("phase", "p_brand")
    )


HUDI_CLUSTER_SQL = f"""
WITH snap AS (
    SELECT p_brand,
           CASE WHEN p_partkey % 40 = 0 THEN p_retailprice + 100.0
                ELSE p_retailprice END AS p_retailprice
    FROM part WHERE p_partkey % 20 = 0
    UNION ALL
    SELECT p_brand, p_retailprice FROM part WHERE p_partkey % 20 = 10
), inc AS (
    SELECT p_brand, p_retailprice + 100.0 AS p_retailprice
    FROM part WHERE p_partkey % 40 = 0
    UNION ALL
    SELECT p_brand, p_retailprice FROM part WHERE p_partkey % 20 = 10
)
SELECT 'snapshot' AS phase, p_brand, {cnt_sql("n")},
       {dsum_sql("p_retailprice", "total")}
FROM snap GROUP BY p_brand
UNION ALL
SELECT 'incremental' AS phase, p_brand, {cnt_sql("n")},
       {dsum_sql("p_retailprice", "total")}
FROM inc GROUP BY p_brand
ORDER BY phase, p_brand
"""


def iceberg_rewrite_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg maintenance round-trip: write a partitioned v2 table,
    commit a position-delete snapshot (converter), REWRITE-DATA-FILES
    (compaction folds the deletes into the rewritten files, committed
    as a `replace` snapshot), then commit a SECOND position-delete
    round against the rewritten files, EXPIRE every snapshot but the
    newest, sweep orphans, and read the final state. Exact iff the
    rewrite kept precisely the live rows, the expiration deleted only
    files the retained snapshot doesn't reference, and the orphan sweep
    spared every live file."""
    from deltacat_spark.sources.iceberg import (
        convert_equality_deletes_to_position,
        expire_snapshots,
        read_iceberg,
        remove_orphan_files,
        rewrite_data_files,
        write_iceberg,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="ice_rw_")
    write_iceberg(
        o.filter(F.col("o_orderkey") % 30 == 0),
        root,
        partition_by=["o_orderpriority"],
    )
    convert_equality_deletes_to_position(spark, root, "o_orderkey % 90 = 0")
    rewrite_data_files(spark, root)
    convert_equality_deletes_to_position(spark, root, "o_orderkey % 60 = 0")
    expire_snapshots(root, keep_last=1)
    remove_orphan_files(root, older_than_s=0)
    back = read_iceberg(spark, root)
    return (
        back.groupBy("o_orderpriority")
        .agg(cnt("n"), dsum("o_totalprice", "total"))
        .orderBy("o_orderpriority")
    )


ICEBERG_REWRITE_SQL = f"""
SELECT o_orderpriority, {cnt_sql("n")}, {dsum_sql("o_totalprice", "total")}
FROM orders
WHERE o_orderkey % 30 = 0
  AND NOT (o_orderkey % 90 = 0)
  AND NOT (o_orderkey % 60 = 0)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "delta_optimize_vacuum": (delta_optimize_vacuum, DELTA_OPTIMIZE_SQL),
    "hudi_cluster_incremental": (
        hudi_cluster_incremental,
        HUDI_CLUSTER_SQL,
    ),
    "iceberg_rewrite_compaction": (
        iceberg_rewrite_compaction,
        ICEBERG_REWRITE_SQL,
    ),
}
