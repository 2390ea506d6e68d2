"""Second batch of relational inventory: cube/grouping-sets, intersect,
lag/lead analytics, exact percentiles, count-distinct, and a two-nation
trade-flow join (TPC-H q7 family) — all Spark-inherited surface
(SURVEY §2.5 'absent in reference' rows) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from deltacat_spark.workloads.base import (
    cnt,
    cnt_sql,
    dsum,
    dsum_sql,
    load,
)


# --- cube -------------------------------------------------------------------
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        cnt("n_orders"), dsum("o_totalprice", "total_price")
    )


CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, {cnt_sql('n_orders')},
       {dsum_sql('o_totalprice', 'total_price')}
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- intersect --------------------------------------------------------------
def set_intersect_active_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that have BOTH an open ('O') and a finished ('F') order."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


# --- lag / lead -------------------------------------------------------------
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag analytics)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
        F.lead(F.col("o_orderkey")).over(w).alias("next_orderkey"),
    )


LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INT) AS days_since_prev,
       lead(o_orderkey) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders WHERE o_custkey % 25 = 0
"""


# --- exact percentiles ------------------------------------------------------
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median/p90 (Spark `percentile` == DuckDB
    `quantile_cont`)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        cnt("n_orders"),
    )


PERCENTILE_SQL = f"""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       {cnt_sql('n_orders')}
FROM orders GROUP BY o_orderstatus
"""


# --- exact count distinct ---------------------------------------------------
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        cnt("n_rows"),
    )


COUNT_DISTINCT_SQL = f"""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       {cnt_sql('n_rows')}
FROM lineitem GROUP BY l_returnflag
"""


# --- q7-style trade flow ----------------------------------------------------
def q7_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flow supplier-nation → customer-nation for two nations."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""


# --- correlated subquery (min-within-group, TPC-H q2 family) ----------------
def min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts sold at their brand's minimum retail price."""
    p = load(spark, sf_dir, "part")
    mins = p.groupBy("p_brand").agg(F.min("p_retailprice").alias("min_price"))
    return (
        p.join(F.broadcast(mins), "p_brand")
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_brand", "p_partkey", "p_retailprice")
    )


MIN_COST_SQL = """
SELECT p_brand, p_partkey, p_retailprice
FROM part
WHERE p_retailprice = (
  SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand)
"""


# --- grouping sets ----------------------------------------------------------
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("dcs_gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, {cnt_sql('n_orders')},
               {dsum_sql('o_totalprice', 'total_price')}
        FROM dcs_gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority, {cnt_sql('n_orders')},
       {dsum_sql('o_totalprice', 'total_price')}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- semi join (EXISTS) -----------------------------------------------------
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_name")


SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


# --- anti join (NOT EXISTS) -------------------------------------------------
def anti_join_unordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never ordered in bulk (quantity ≥ 48)."""
    p = load(spark, sf_dir, "part")
    l = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 48)
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    return (
        p.join(l, "p_partkey", "left_anti")
        .groupBy("p_brand")
        .agg(cnt("never_bulk_ordered"))
    )


ANTI_SQL = f"""
SELECT p_brand, {cnt_sql('never_bulk_ordered')}
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_quantity >= 48)
GROUP BY p_brand
"""


# --- limit / offset pagination ----------------------------------------------
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .offset(40)
        .limit(20)
    )


PAGE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40
"""


# --- scalar subquery threshold ----------------------------------------------
def above_median_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    med = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    return (
        o.crossJoin(F.broadcast(med))
        .filter(F.col("o_totalprice") > F.col("med"))
        .groupBy("o_orderpriority")
        .agg(cnt("n_above_median"))
    )


ABOVE_MEDIAN_SQL = f"""
SELECT o_orderpriority, {cnt_sql('n_above_median')}
FROM orders
WHERE o_totalprice > (SELECT quantile_cont(o_totalprice, 0.5) FROM orders)
GROUP BY o_orderpriority
"""


QUERIES = {
    "cube_order_status": (cube_order_status, CUBE_SQL),
    "grouping_sets_orders": (grouping_sets_orders, GROUPING_SETS_SQL),
    "semi_join_big_spenders": (semi_join_big_spenders, SEMI_SQL),
    "anti_join_unordered_parts": (anti_join_unordered_parts, ANTI_SQL),
    "limit_offset_page": (limit_offset_page, PAGE_SQL),
    "above_median_orders": (above_median_orders, ABOVE_MEDIAN_SQL),
    "set_intersect_active_buyers": (set_intersect_active_buyers, INTERSECT_SQL),
    "window_order_gaps": (window_order_gaps, LAG_LEAD_SQL),
    "percentile_prices": (percentile_prices, PERCENTILE_SQL),
    "count_distinct_parts": (count_distinct_parts, COUNT_DISTINCT_SQL),
    "q7_trade_flow": (q7_trade_flow, Q7_SQL),
    "min_cost_part": (min_cost_part, MIN_COST_SQL),
}
