"""Fifth batch of relational inventory: TPC-H q8/q9/q10 families adapted
to the synthetic schema (no `partsupp` table exists in the testdata, so
q2/q11/q16/q20 are out of scope and q9's supply cost is proxied from
`p_retailprice`). All Spark-inherited surface (the reference's
`dc.query` is NotImplemented — `api.py:560`); each query has an exact
DuckDB oracle.

Plan shape at scale: every query is one pass over lineitem with the
small dimensions (nation/region/part/supplier) broadcast — no shuffle
wider than the final group-by; orders/customer joins shuffle on their
keys and AQE handles skew. Ratios and sums go through the scaled-long
form (`base.dsum` rationale) so values are bit-identical across
engines regardless of partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import (
    SUM_SCALE,
    _scaled,
    cnt_sql,
    dsum,
    dsum_sql,
    load,
)


# --- q8 family: national market share ---------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of ASIA-region STANDARD-part revenue supplied by NATION_3,
    per order year (the two-role nation join: customer nation restricts
    the market, supplier nation is the share numerator). Numerator and
    denominator are the SAME scaled-long sum, split by a flag — one
    aggregation, one shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    n_cust = load(spark, sf_dir, "nation").alias("nc")
    n_supp = load(spark, sf_dir, "nation").alias("ns")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    rev = _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n_cust), c["c_nationkey"] == F.col("nc.n_nationkey"))
        .join(F.broadcast(r), F.col("nc.n_regionkey") == r["r_regionkey"])
        .join(F.broadcast(n_supp), s["s_nationkey"] == F.col("ns.n_nationkey"))
    )
    is_target = F.col("ns.n_name") == "NATION_3"
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(is_target, rev).otherwise(F.lit(0))).cast("double")
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
  ROUND(
    CAST(SUM(CASE WHEN ns.n_name = 'NATION_3'
      THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * {SUM_SCALE} + 0.5)
           AS BIGINT) ELSE 0 END) AS DOUBLE)
    / SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * {SUM_SCALE} + 0.5)
          AS BIGINT)),
  6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN nation ns ON s_nationkey = ns.n_nationkey
GROUP BY year(o_orderdate) ORDER BY o_year
"""


# --- q9 family: product-type profit by nation/year --------------------------
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation per order year for PROMO parts. The
    testdata has no `partsupp`, so supply cost is proxied as 60% of
    `p_retailprice` per unit (deterministic double arithmetic — the
    identical IEEE expression on both engines). One lineitem pass,
    dims broadcast, single group-by shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = load(spark, sf_dir, "nation")

    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  {dsum_sql("l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity",
            "sum_profit")}
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# Half-up 2-decimal rounding done in INTEGER space: `round(sum/1e4, 2)`
# on a double hits the .xx5 boundary differently per engine (Spark rounds
# the shortest decimal repr half-up; DuckDB rounds the binary double,
# e.g. 307843.595 → 307843.6 vs .59). (scaled_sum + 50) div 100 is exact
# integer arithmetic on both; dividing the SAME integer by 100.0 yields
# the same double. Safe while scaled sums stay below 2^53 (≈9e15, i.e.
# ~9e11 in raw units — repartition the aggregation or raise SUM_SCALE
# precision before that).
def _dsum_cents(col, alias: str):
    s = F.sum(_scaled(col)) + F.lit(50)
    return (F.floor(s / F.lit(100)) / F.lit(100.0)).alias(alias)


def _dsum_cents_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(FLOOR((SUM(CAST(FLOOR(({expr}) * {SUM_SCALE} + 0.5) AS BIGINT))"
        f" + 50) / 100) AS BIGINT) / 100.0 AS {alias}"
    )


# --- q10 family: returned-item customer ranking -----------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns (l_returnflag='R')
    for Q1-1996 orders — the returned-item reporting family. Global
    top-k after one custkey-grouped aggregation; ties broken by custkey
    so the cut is deterministic on both engines."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1996) & (F.quarter("o_orderdate") == 1)
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum_cents(rev, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
  {_dsum_cents_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND year(o_orderdate) = 1996 AND quarter(o_orderdate) = 1
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- order/lineitem reconciliation audit ------------------------------------
def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: top-25 orders whose header total diverges
    most from the sum of their line items (both sides as exact
    1e-4-scaled longs, so the diff is an integer — no float crosses the
    comparison). The reconciliation join shuffles once on orderkey;
    severity ranking is a bounded global top-k."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    li_sum = li.groupBy("l_orderkey").agg(
        F.sum(_scaled(F.col("l_extendedprice"))).alias("li_scaled")
    )
    o_side = o.select(
        "o_orderkey", _scaled(F.col("o_totalprice")).alias("o_scaled")
    )
    diff = F.abs(F.col("o_scaled") - F.col("li_scaled"))
    return (
        o_side.join(li_sum, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            (F.col("o_scaled").cast("double") / SUM_SCALE).alias("header_total"),
            (F.col("li_scaled").cast("double") / SUM_SCALE).alias("lines_total"),
            (diff.cast("double") / SUM_SCALE).alias("abs_diff"),
        )
        .orderBy(F.desc("abs_diff"), "o_orderkey")
        .limit(25)
    )


RECON_SQL = f"""
WITH li_sum AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_extendedprice * {SUM_SCALE} + 0.5) AS BIGINT))
           AS li_scaled
  FROM lineitem GROUP BY l_orderkey)
SELECT o_orderkey,
  CAST(CAST(FLOOR(o_totalprice * {SUM_SCALE} + 0.5) AS BIGINT) AS DOUBLE)
    / {SUM_SCALE} AS header_total,
  CAST(li_scaled AS DOUBLE) / {SUM_SCALE} AS lines_total,
  CAST(abs(CAST(FLOOR(o_totalprice * {SUM_SCALE} + 0.5) AS BIGINT) - li_scaled)
       AS DOUBLE) / {SUM_SCALE} AS abs_diff
FROM orders JOIN li_sum ON o_orderkey = l_orderkey
ORDER BY abs_diff DESC, o_orderkey LIMIT 25
"""


QUERIES = {
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_nation_profit": (q9_nation_profit, Q9_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "order_reconciliation": (order_reconciliation, RECON_SQL),
}
