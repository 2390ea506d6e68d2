"""Third batch of relational inventory: TPC-H q4/q12/q14/q19 families
adapted to the synthetic schema — correlated EXISTS, conditional
aggregation, ratio-of-sums, and OR-of-ANDs multi-bracket predicates.
All Spark-inherited surface (the reference's `dc.query` is
NotImplemented — `api.py:560`); each query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import cnt, cnt_sql, dsum, dsum_sql, load


# --- q4 family: correlated EXISTS -------------------------------------------
def q4_order_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority where at least one line shipped strictly
    after the order date (correlated-EXISTS → LEFT SEMI join with a
    non-equi conjunct; the equi key still drives the shuffle, so the
    plan is a hash semi-join, not a nested loop)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(cnt("n_orders"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = f"""
SELECT o_orderpriority, {cnt_sql('n_orders')}
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- q12 family: conditional-count shipping summary -------------------------
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ship-year: high-priority vs low-priority line counts
    (conditional aggregation over a join — one shuffle, counts fold
    map-side)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_SQL = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY year(l_shipdate) ORDER BY ship_year
"""


# --- q14 family: promo revenue share ----------------------------------------
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of discounted revenue from PROMO parts in one ship-year.
    Ratio of two order-independent scaled-long sums (`base.dsum`
    rationale) so the division is over identical integers on both
    engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1998
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scaled = F.floor(rev * 10_000 + F.lit(0.5)).cast("long")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", scaled).otherwise(0))
            / F.sum(scaled),
            6,
        ).alias("promo_share")
    )


Q14_SQL = """
SELECT ROUND(
  100.0 * SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
      ELSE 0 END)
  / SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)),
  6) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) = 1998
"""


# --- q19 family: OR-of-ANDs bracket predicate -------------------------------
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue across three (brand, size, quantity)
    brackets — the OR-of-ANDs predicate family Catalyst splits into
    join-key + residual filters; the part side broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    brackets = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(brackets).agg(dsum(rev, "revenue"))


Q19_SQL = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


QUERIES = {
    "q4_order_exists": (q4_order_exists, Q4_SQL),
    "q12_priority_shipping": (q12_priority_shipping, Q12_SQL),
    "q14_promo_share": (q14_promo_share, Q14_SQL),
    "q19_bracket_revenue": (q19_bracket_revenue, Q19_SQL),
}
