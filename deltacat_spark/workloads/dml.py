"""DML-semantics inventory — the deltacat-parity mutation programs run as
pure queries over the driver's tables, each with a DuckDB oracle.

Each query derives an "update"/"delete" batch deterministically from the
base tables, applies the corresponding operator from
`deltacat_spark.operators.merge`, and returns the merged result — the
exact dataflow the reference runs inside compaction (SURVEY §2.3-§2.5,
§3.3), minus the commit-log bookkeeping (which pytest covers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.localdf import local_df

from deltacat_spark.operators.merge import (
    dedupe_last_writer,
    dedupe_last_writer_agg,
    equality_delete,
    hash_bucket,
    partial_upsert,
    upsert,
)
from deltacat_spark.workloads.base import (
    EVENTS_US,
    cnt,
    cnt_sql,
    dsum,
    dsum_sql,
    load,
    md5_prefix_int_sql,
)


# --- MERGE (full-row upsert) ------------------------------------------------
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `_merge_tables` (`steps/merge.py:138-253`)."""
    o = load(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.to_date("o_orderdate")
    )
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    )
    return upsert(o, updates, ["o_orderkey"], broadcast_updates=True)


MERGE_UPSERT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
  FROM orders
), updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM base WHERE o_orderkey % 10 = 0
)
SELECT * FROM base WHERE NOT EXISTS (
  SELECT 1 FROM updates u WHERE u.o_orderkey = base.o_orderkey)
UNION ALL
SELECT * FROM updates
"""


# --- DELETE (null-safe equality anti-join) ---------------------------------
def delete_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `delete_strategy_equality_delete.py:52-210`."""
    o = load(spark, sf_dir, "orders")
    deletes = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    survivors = equality_delete(o, deletes, ["o_custkey"])
    return survivors.groupBy("o_orderstatus").agg(
        cnt("n_orders"), dsum("o_totalprice", "total_price")
    )


DELETE_SQL = f"""
SELECT o_orderstatus, {cnt_sql('n_orders')}, {dsum_sql('o_totalprice', 'total_price')}
FROM orders
WHERE NOT EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_custkey = orders.o_custkey AND c.c_mktsegment = 'BUILDING')
GROUP BY o_orderstatus
"""


# --- partial upsert (field-level coalesce) ---------------------------------
def merge_partial_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference `_merge_records_partially` (`steps/merge.py:256-308`)."""
    c = load(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", (F.col("c_acctbal") + F.lit(50.0)).alias("c_acctbal")
    )
    return partial_upsert(c, updates, ["c_custkey"])


PARTIAL_UPSERT_SQL = """
WITH updates AS (
  SELECT c_custkey, c_acctbal + 50.0 AS new_bal
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT c.c_custkey, c.c_name, c.c_nationkey,
       coalesce(u.new_bal, c.c_acctbal) AS c_acctbal, c.c_mktsegment
FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
"""


# --- last-writer-wins dedupe ------------------------------------------------
def dedupe_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference dedupe (`compactor_v2/utils/dedupe.py:32-70`): one winner
    per key by descending (position, tiebreak) — here (ts, event_id)."""
    e = load(spark, sf_dir, "events")
    return dedupe_last_writer(
        e,
        ["user_id", "event_type"],
        [F.desc("ts_us"), F.desc("event_id")],
    ).select("user_id", "event_type", "event_id", "ts_us", "value")


DEDUPE_LWW_SQL = f"""
SELECT user_id, event_type, event_id, ts_us, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM {EVENTS_US}
) WHERE rn = 1
"""


# --- CHRONO stream positions ------------------------------------------------
def chrono_stream_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference CHRONO mode (`catalog/main/impl.py:603-624`): stream
    position = event-time unix timestamp; late data permitted. Returns the
    per-user first/last positions and event counts."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return e.groupBy("user_id").agg(
        F.min("ts_us").alias("first_pos"),
        F.max("ts_us").alias("last_pos"),
        cnt("n_events"),
        dsum("value", "total_value"),
    )


CHRONO_SQL = f"""
SELECT user_id, min(ts_us) AS first_pos, max(ts_us) AS last_pos,
       {cnt_sql('n_events')}, {dsum_sql('value', 'total_value')}
FROM {EVENTS_US}
WHERE event_type = 'purchase'
GROUP BY user_id
"""


# --- hash-bucket shuffle ----------------------------------------------------
def hash_bucket_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference hash-bucket step (`compactor_v2/steps/hash_bucket.py:49-144`):
    digest-stable bucket of the merge key; output per-bucket stats."""
    l = load(spark, sf_dir, "lineitem")
    b = hash_bucket(l, ["l_orderkey", "l_linenumber"], 8, bucket_col="bucket")
    return b.groupBy("bucket").agg(cnt("n_rows"), dsum("l_quantity", "sum_qty"))


HASH_BUCKET_SQL = f"""
SELECT CAST({md5_prefix_int_sql("concat(CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))")} % 8 AS INT) AS bucket,
       {cnt_sql('n_rows')}, {dsum_sql('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY 1
"""


# --- last-writer-wins dedupe, aggregation form ------------------------------
def dedupe_lww_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-immune dedupe via max(struct(...)) with map-side combine —
    same answer as `dedupe_lww`, different (hot-key-safe) physical plan.
    See `operators.merge.dedupe_last_writer_agg`."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_us", "value"
    )
    out = dedupe_last_writer_agg(
        e, ["user_id", "event_type"], ["ts_us", "event_id"]
    )
    return out.select("user_id", "event_type", "event_id", "ts_us", "value")


# --- SQL MERGE INTO surface (generalized forms, end-to-end) -----------------
def _merge_fixture(spark: SparkSession, sf_dir: str, merge_sql: str) -> DataFrame:
    """Run a MERGE statement through the REAL `Catalog.sql` path (temp
    lakehouse root, customer loaded as a keyed table plus an `updates`
    source table) and return the materialized post-merge state. The
    result is collected so the temp root can be removed — these rows are
    customer-sized (1.5k at sf0.01), never corpus-sized."""
    import shutil
    import tempfile

    from deltacat_spark.catalog import Catalog
    from deltacat_spark.schema import Schema

    root = tempfile.mkdtemp(prefix="dcs_sqlmerge_")
    try:
        cat = Catalog(spark, root)
        c = load(spark, sf_dir, "customer")
        sch = Schema.from_dataframe(c)
        for fld in sch.fields:
            if fld.name == "c_custkey":
                fld.merge_key = True
        cat.write_to_table(c, "cust", schema=sch)
        upd = (
            c.filter(F.col("c_custkey") % 3 == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(100.0))
            .unionByName(
                c.filter(F.col("c_custkey") % 5 == 0).withColumn(
                    "c_custkey", F.col("c_custkey") + F.lit(1_000_000)
                )
            )
        )
        cat.write_to_table(upd, "updates")  # keyless source table
        cat.sql(merge_sql, count_rows=False)
        out = cat.read_table("cust")
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def sql_merge_predicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized MERGE (round-7 surface): WHEN MATCHED AND <pred> THEN
    UPDATE SET * plus WHEN NOT MATCHED AND <pred> THEN INSERT *, reduced
    to ONE keyed upsert commit (reference stubs SQL entirely,
    `api.py:480-481`; this is the repo's Delta-style surface)."""
    return _merge_fixture(
        spark,
        sf_dir,
        "MERGE INTO cust t USING updates s ON t.c_custkey = s.c_custkey"
        " WHEN MATCHED AND s.c_acctbal > 500.0 THEN UPDATE SET *"
        " WHEN NOT MATCHED AND s.c_mktsegment = 'BUILDING' THEN INSERT *",
    )


SQL_MERGE_PREDICATED_SQL = """
WITH upd AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 5 = 0
)
SELECT c.c_custkey, c.c_name, c.c_nationkey,
       CASE WHEN u.c_custkey IS NOT NULL AND u.c_acctbal > 500.0
            THEN u.c_acctbal ELSE c.c_acctbal END AS c_acctbal,
       c.c_mktsegment
FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
UNION ALL
SELECT u.c_custkey, u.c_name, u.c_nationkey, u.c_acctbal, u.c_mktsegment
FROM upd u
WHERE u.c_mktsegment = 'BUILDING'
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = u.c_custkey)
"""


def sql_merge_column_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized MERGE: column-level UPDATE SET with expressions over
    BOTH aliases — full-row stitch (≡ partial_upsert) in one commit."""
    return _merge_fixture(
        spark,
        sf_dir,
        "MERGE INTO cust t USING updates s ON t.c_custkey = s.c_custkey"
        " WHEN MATCHED THEN UPDATE SET"
        " c_acctbal = t.c_acctbal + (s.c_acctbal - t.c_acctbal) / 2,"
        " c_mktsegment = upper(t.c_mktsegment)",
    )


SQL_MERGE_COLUMN_SET_SQL = """
WITH upd AS (
  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, c_acctbal
  FROM customer WHERE c_custkey % 5 = 0
)
SELECT c.c_custkey, c.c_name, c.c_nationkey,
       CASE WHEN u.c_custkey IS NOT NULL
            THEN c.c_acctbal + (u.c_acctbal - c.c_acctbal) / 2
            ELSE c.c_acctbal END AS c_acctbal,
       CASE WHEN u.c_custkey IS NOT NULL THEN upper(c.c_mktsegment)
            ELSE c.c_mktsegment END AS c_mktsegment
FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
"""


QUERIES = {
    "sql_merge_predicated": (sql_merge_predicated, SQL_MERGE_PREDICATED_SQL),
    "sql_merge_column_set": (sql_merge_column_set, SQL_MERGE_COLUMN_SET_SQL),
    "dedupe_lww_agg": (dedupe_lww_agg, DEDUPE_LWW_SQL),
    "merge_upsert": (merge_upsert, MERGE_UPSERT_SQL),
    "delete_equality": (delete_equality, DELETE_SQL),
    "merge_partial_upsert": (merge_partial_upsert, PARTIAL_UPSERT_SQL),
    "dedupe_lww": (dedupe_lww, DEDUPE_LWW_SQL),
    "chrono_stream_positions": (chrono_stream_positions, CHRONO_SQL),
    "hash_bucket_distribution": (hash_bucket_distribution, HASH_BUCKET_SQL),
}
