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


QUERIES = {
    "dedupe_lww_agg": (dedupe_lww_agg, DEDUPE_LWW_SQL),
    "merge_upsert": (merge_upsert, MERGE_UPSERT_SQL),
    "delete_equality": (delete_equality, DELETE_SQL),
    "merge_partial_upsert": (merge_partial_upsert, PARTIAL_UPSERT_SQL),
    "dedupe_lww": (dedupe_lww, DEDUPE_LWW_SQL),
    "chrono_stream_positions": (chrono_stream_positions, CHRONO_SQL),
    "hash_bucket_distribution": (hash_bucket_distribution, HASH_BUCKET_SQL),
}
