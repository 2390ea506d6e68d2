"""Fourth batch of relational inventory: TPC-H q13/q15/q17/q18/q21/q22
families adapted to the synthetic schema — outer-join distribution,
scalar-max view join, decorrelated per-group scalar subquery,
HAVING-gated self-aggregation join-back, double-correlated
EXISTS/NOT EXISTS, and global-scalar + anti-join. All Spark-inherited surface (the reference's
`dc.query` is NotImplemented — `api.py:560`); each query has an exact
DuckDB oracle.

Every float that crosses a comparison or an aggregate goes through the
scaled-long form (`base.dsum` rationale) so row membership and output
values are bit-identical across engines regardless of partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import (
    SUM_SCALE,
    _scaled,
    cnt,
    cnt_sql,
    load,
)


# --- q13 family: customer order-count distribution --------------------------
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N non-urgent orders, including
    N = 0 (the LEFT OUTER JOIN + two-level aggregation family; the
    outer join shuffles on custkey once, both aggs fold map-side)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    counts = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(cnt("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = f"""
SELECT c_count, {cnt_sql('custdist')} FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) pc
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --- q17 family: small-quantity revenue vs per-part average ------------------
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue from lines under half their part's average
    quantity, one brand (the correlated scalar-subquery family —
    decorrelated into a per-part aggregate joined back on the same key,
    so Catalyst reuses one shuffle partitioning for agg and join).
    The average is derived from the scaled-long sum so the `< 0.5*avg`
    row-membership test is engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    ag = j.groupBy("l_partkey").agg(
        (
            F.sum(_scaled(F.col("l_quantity"))).cast("double")
            / (F.lit(float(SUM_SCALE)) * F.count(F.lit(1)))
        ).alias("avg_qty")
    )
    small = j.join(ag, "l_partkey").filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return small.agg(
        F.round(
            F.sum(_scaled(F.col("l_extendedprice"))).cast("double")
            / F.lit(float(SUM_SCALE))
            / F.lit(7.0),
            2,
        ).alias("avg_weekly")
    )


Q17_SQL = f"""
WITH j AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2'),
ag AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_quantity * {SUM_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
           / (CAST({SUM_SCALE} AS DOUBLE) * COUNT(*)) AS avg_qty
  FROM j GROUP BY l_partkey)
SELECT ROUND(
  CAST(SUM(CAST(FLOOR(j.l_extendedprice * {SUM_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
    / CAST({SUM_SCALE} AS DOUBLE) / CAST(7 AS DOUBLE), 2) AS avg_weekly
FROM j JOIN ag ON j.l_partkey = ag.l_partkey
WHERE j.l_quantity < CAST(0.5 AS DOUBLE) * ag.avg_qty
"""


# --- q18 family: large-volume customers -------------------------------------
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding orders whose total quantity exceeds 300 (the
    HAVING-gated self-aggregation family: one agg over lineitem keyed
    on orderkey, the survivors join back to orders+customer — the big
    fact aggregates once, the join-back side is tiny)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_scaled(F.col("l_quantity"))).alias("sq"))
        .filter(F.col("sq") > 300 * SUM_SCALE)
    )
    j = big.join(o, big["l_orderkey"] == o["o_orderkey"]).join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    return (
        j.groupBy("c_custkey", "c_name")
        .agg(
            cnt("n_big_orders"),
            F.round(
                F.sum("sq").cast("double") / F.lit(float(SUM_SCALE)), 2
            ).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "c_custkey")
    )


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_quantity * {SUM_SCALE} + 0.5) AS BIGINT)) AS sq
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(FLOOR(l_quantity * {SUM_SCALE} + 0.5) AS BIGINT)) > 300 * {SUM_SCALE})
SELECT c_custkey, c_name, {cnt_sql('n_big_orders')},
       ROUND(CAST(SUM(sq) AS DOUBLE) / CAST({SUM_SCALE} AS DOUBLE), 2) AS total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_qty DESC, c_custkey
"""


# --- q22 family: above-average balances with no urgent orders ---------------
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: customers whose balance beats the positive-
    balance average for the segment group yet placed no URGENT order
    (the global-scalar-subquery + anti-join family: the 1-row average
    broadcasts, the anti-join shuffles on custkey)."""
    segs = ["AUTOMOBILE", "MACHINERY", "HOUSEHOLD"]
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(segs)
    )
    avg_df = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(_scaled(F.col("c_acctbal"))).cast("double")
                / (F.lit(float(SUM_SCALE)) * F.count(F.lit(1)))
            ).alias("avg_bal")
        )
    )
    rich = c.crossJoin(F.broadcast(avg_df)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    idle = rich.join(
        urgent, rich["c_custkey"] == urgent["o_custkey"], "left_anti"
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            cnt("numcust"),
            F.round(
                F.sum(_scaled(F.col("c_acctbal"))).cast("double")
                / F.lit(float(SUM_SCALE)),
                2,
            ).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = f"""
WITH seg AS (
  SELECT * FROM customer
  WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD')),
avg_bal AS (
  SELECT CAST(SUM(CAST(FLOOR(c_acctbal * {SUM_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
           / (CAST({SUM_SCALE} AS DOUBLE) * COUNT(*)) AS avg_bal
  FROM seg WHERE c_acctbal > 0)
SELECT c_mktsegment, {cnt_sql('numcust')},
       ROUND(CAST(SUM(CAST(FLOOR(c_acctbal * {SUM_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
             / CAST({SUM_SCALE} AS DOUBLE), 2) AS totacctbal
FROM seg CROSS JOIN avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = seg.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --- q15 family: top-revenue suppliers (scalar-max view join) ---------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose 1998 discounted revenue equals the maximum (the
    revenue-view + scalar-subquery family). The per-supplier revenue
    aggregates once; the 1-row max broadcasts back onto it; equality is
    exact because both sides compare the same scaled-long integer."""
    li = load(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1998)
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("rev_scaled")
    )
    mx = rev.agg(F.max("rev_scaled").alias("max_scaled"))
    top = rev.join(F.broadcast(mx), rev["rev_scaled"] == mx["max_scaled"])
    return (
        top.join(s, top["l_suppkey"] == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(
                F.col("rev_scaled").cast("double") / F.lit(float(SUM_SCALE)), 2
            ).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * {SUM_SCALE} + 0.5)
             AS BIGINT)) AS rev_scaled
  FROM lineitem WHERE year(l_shipdate) = 1998 GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       ROUND(CAST(rev_scaled AS DOUBLE) / CAST({SUM_SCALE} AS DOUBLE), 2)
         AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_scaled = (SELECT MAX(rev_scaled) FROM rev)
ORDER BY s_suppkey
"""


# --- q21 family: sole late supplier on multi-supplier orders ----------------
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper (> 60 days after the
    order date) on an order that involved other suppliers — the
    double-correlated EXISTS / NOT EXISTS family. Both correlations
    decorrelate to self-joins of the lineitem-orders view on orderkey:
    one LEFT SEMI (another supplier shipped on the order) and one LEFT
    ANTI (no OTHER supplier shipped late), so every join shuffles on
    the same l_orderkey key and Catalyst reuses the partitioning."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    lo = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60).alias(
            "late"
        ),
    )
    late = lo.filter("late").select("l_orderkey", "l_suppkey").distinct()
    others = lo.select("l_orderkey", "l_suppkey").distinct()
    # EXISTS: some line on the order from a different supplier
    has_other = late.alias("l1").join(
        others.alias("l2"),
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no OTHER supplier was late on the same order
    sole = has_other.alias("l1").join(
        late.alias("l3"),
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(s, sole["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(cnt("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
    )


Q21_SQL = f"""
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late),
others AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo)
SELECT s_suppkey, s_name, {cnt_sql('numwait')}
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM others l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
"""


QUERIES = {
    "q13_order_distribution": (q13_order_distribution, Q13_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "q22_idle_balances": (q22_idle_balances, Q22_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q21_sole_late_supplier": (q21_sole_late_supplier, Q21_SQL),
}
