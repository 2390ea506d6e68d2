"""Relational query inventory — the Spark-inherited analytic surface.

The reference has *no* SQL engine (`dc.query` is NotImplemented,
reference `api.py:480-481`); SURVEY §2.2/§2.3/§2.5 maps its scan/
projection/filter/agg surface onto Spark primitives and notes that
joins/windows/set-ops/rollups come free via Catalyst. These queries
demonstrate that surface on the driver's TPC-H-ish tables with an exact
DuckDB oracle for each.

Scale notes (100 TB stance):
* Aggregations use map-side partial aggregation automatically (hash agg).
* Dimension joins (`region`, `nation`, `customer`, `supplier`) are
  explicitly `broadcast()` so the fact scan never shuffles for them.
* Filters/projections are expressed declaratively so Catalyst pushes
  them into the parquet scan (verified via `.explain` in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import (
    cnt,
    cnt_sql,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    load,
)


# --- q1: pricing summary (scan → filter → group-agg) -----------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            cnt("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {dsum_sql('l_quantity', 'sum_qty')},
  {dsum_sql('l_extendedprice', 'sum_base_price')},
  {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {davg_sql('l_quantity', 'avg_qty')},
  {davg_sql('l_extendedprice', 'avg_price')},
  {davg_sql('l_discount', 'avg_disc')},
  {cnt_sql('count_order')}
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- q6: forecast revenue (tight filter → single agg) ----------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


Q6_SQL = f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- scan with projection + filter pushdown --------------------------------
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection/filter pushdown scan (reference `columns=` + row filters,
    SURVEY §2.2 — `catalog/main/impl.py:1646`, `utils/pyarrow.py:889-921`)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
            & (F.col("l_quantity") >= 45)
            & (F.col("l_returnflag") == "N")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.to_date("l_shipdate").alias("ship_date"),
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


SCAN_SQL = """
SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
       l_quantity, l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_quantity >= 45
  AND l_returnflag = 'N'
"""


# --- q3: shipping priority (join + agg + top-k) ----------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
  {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- q5: local supplier volume (6-way join) --------------------------------
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q5_SQL = f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- broadcast dim join chain ----------------------------------------------
def broadcast_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim broadcast join (SURVEY §2.3 — reference has no general
    joins; Spark's broadcast covers the dim-lookup pattern shuffle-free)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(cnt("supplier_count"), dsum("s_acctbal", "total_acctbal"))
    )


BROADCAST_SQL = f"""
SELECT r_name, {cnt_sql('supplier_count')}, {dsum_sql('s_acctbal', 'total_acctbal')}
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- group-by + having -----------------------------------------------------
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(cnt("order_count"), dsum("o_totalprice", "total_spend"))
        .filter(F.col("order_count") >= 14)
    )


HAVING_SQL = f"""
SELECT o_custkey, {cnt_sql('order_count')}, {dsum_sql('o_totalprice', 'total_spend')}
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 14
"""


# --- window: top-k per group ------------------------------------------------
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rank_in_nation")
    )


TOPK_SQL = """
SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INT) AS rank_in_nation
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn <= 3
"""


# --- window: running sum ----------------------------------------------------
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.filter(F.col("o_custkey") % 50 == 0).select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,10)")).over(w), 2)
        .cast("double")
        .alias("running_spend"),
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    AS running_spend
FROM orders WHERE o_custkey % 50 = 0
"""


# --- rollup ----------------------------------------------------------------
def rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        cnt("n_rows"), dsum("l_quantity", "sum_qty")
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, {cnt_sql('n_rows')}, {dsum_sql('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- set ops ----------------------------------------------------------------
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers with no orders (SURVEY §2.5: set ops
    absent in the reference, inherited from Spark)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o.distinct()).distinct()


EXCEPT_SQL = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
"""


# --- distinct ---------------------------------------------------------------
def distinct_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


DISTINCT_SQL = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


# --- LIKE / IN / null-handling filter ---------------------------------------
def filter_like_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-surface breadth: LIKE, IN, NOT, null-safe coalesce —
    the reference's expression AST ops (`expression.py:17-657`) compiled
    through `plans.expr` to Catalyst and pushed to the scan."""
    from deltacat_spark.plans.expr import col

    p = load(spark, sf_dir, "part")
    e = (
        col("p_name").like("%a%")
        .and_(col("p_type").in_(["ECONOMY", "PROMO", "SMALL"]))
        .and_(col("p_size").between(10, 40))
        .and_(col("p_retailprice").is_null().not_())
    )
    return p.filter(e.to_column()).select(
        "p_partkey",
        "p_name",
        "p_type",
        F.coalesce(F.col("p_brand"), F.lit("?")).alias("brand"),
    )


LIKE_IN_SQL = """
SELECT p_partkey, p_name, p_type, coalesce(p_brand, '?') AS brand
FROM part
WHERE p_name LIKE '%a%'
  AND p_type IN ('ECONOMY', 'PROMO', 'SMALL')
  AND p_size BETWEEN 10 AND 40
  AND NOT (p_retailprice IS NULL)
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "filter_like_in": (filter_like_in, LIKE_IN_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "scan_filter_project": (scan_filter_project, SCAN_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "broadcast_join_dims": (broadcast_join_dims, BROADCAST_SQL),
    "agg_having": (agg_having, HAVING_SQL),
    "window_topk_per_group": (window_topk_per_group, TOPK_SQL),
    "window_running_sum": (window_running_sum, RUNNING_SQL),
    "rollup_returnflag": (rollup_returnflag, ROLLUP_SQL),
    "set_except_customers": (set_except_customers, EXCEPT_SQL),
    "distinct_order_profile": (distinct_order_profile, DISTINCT_SQL),
}
