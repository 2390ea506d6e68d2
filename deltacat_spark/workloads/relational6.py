"""TPC-H q2/q11/q16/q20 analogs — completing the 22-query suite.

The driver testdata carries no ``partsupp`` table, so these four (the
only TPC-H queries needing it) run over a DERIVED partsupp: 4 suppliers
per part chosen by modular arithmetic over the contiguous 0-based key
ranges, with integer-cents supply cost — the SAME closed-form rows in
Spark and DuckDB, so the oracle comparison stays exact. Supply-cost
aggregation happens in BIGINT cents end-to-end (no float drift).

Both sides are expressed as SQL text over registered views (Spark SQL
→ Catalyst; scalar subqueries decorrelate, the derived partsupp is a
projected 4× explode of `part` — no shuffle to build it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deltacat_spark.workloads.base import load

_PS = """
ps AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + i * 17) % (SELECT COUNT(*) FROM supplier)
           AS ps_suppkey,
         (p_partkey * 7 + ((p_partkey + i * 17) %
            (SELECT COUNT(*) FROM supplier)) * 3) % 9999 + 1
           AS ps_availqty,
         (p_partkey * 13 + ((p_partkey + i * 17) %
            (SELECT COUNT(*) FROM supplier)) * 29) % 100000 + 100
           AS ps_cost_cents
  FROM part CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1
                        UNION ALL SELECT 2 UNION ALL SELECT 3) gen
)"""


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    for t in ("part", "supplier", "nation", "region", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


# --- q2: min-cost supplier ---------------------------------------------------
Q2_SQL = f"""
WITH {_PS},
europe AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
cand AS (
  SELECT p_partkey, p_name, s_name, n_name,
         s_acctbal,
         ps_cost_cents
  FROM part
  JOIN ps ON p_partkey = ps_partkey
  JOIN europe ON ps_suppkey = s_suppkey
  WHERE p_type = 'STANDARD')
SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
       CAST(ps_cost_cents AS DOUBLE) / 100.0 AS supplycost
FROM cand
WHERE ps_cost_cents = (
  SELECT MIN(c2.ps_cost_cents) FROM cand c2
  WHERE c2.p_partkey = cand.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 analog (reference query family; derived partsupp). The
    correlated MIN decorrelates to a per-part aggregate joined back —
    Catalyst plans it as two hash aggregates + one broadcastable join."""
    return _run(spark, sf_dir, Q2_SQL)


# --- q11: important stock ----------------------------------------------------
Q11_SQL = f"""
WITH {_PS},
nat AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'),
vals AS (
  SELECT ps_partkey,
         CAST(SUM(CAST(ps_cost_cents AS BIGINT) * ps_availqty) AS BIGINT)
           AS value_cents
  FROM ps JOIN nat ON ps_suppkey = s_suppkey
  GROUP BY ps_partkey)
SELECT ps_partkey,
       CAST(value_cents AS DOUBLE) / 100.0 AS part_value
FROM vals
WHERE value_cents * (SELECT COUNT(*) FROM vals) * 5 >
      (SELECT SUM(value_cents) FROM vals) * 6
ORDER BY value_cents DESC, ps_partkey
LIMIT 200
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 analog: per-part inventory value vs a global-fraction
    1.2x-mean cutoff (6/5 in integers, scale-invariant and exact)."""
    return _run(spark, sf_dir, Q11_SQL)


# --- q16: parts/supplier relationship ---------------------------------------
Q16_SQL = f"""
WITH {_PS}
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 19, 23)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q16_part_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 analog: distinct-supplier counts per (brand, type,
    size) with exclusion filters; one distinct-aggregate shuffle."""
    return _run(spark, sf_dir, Q16_SQL)


# --- q20: potential part promotion ------------------------------------------
Q20_SQL = f"""
WITH {_PS},
shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS qty_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_partkey, l_suppkey)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM ps
JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'red%'
JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier s ON ps_suppkey = s.s_suppkey
WHERE CAST(ps_availqty AS BIGINT) * 100 > qty_cents / 2.0
ORDER BY s.s_suppkey
"""


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 analog: suppliers whose derived stock of 'red%' parts
    exceeds half the quantity they shipped in 1996 — semi-join shaped,
    quantity summed in integer hundredths."""
    return _run(spark, sf_dir, Q20_SQL)


QUERIES = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q16_part_supplier_relation": (q16_part_supplier_relation, Q16_SQL),
    "q20_part_promotion": (q20_part_promotion, Q20_SQL),
}
