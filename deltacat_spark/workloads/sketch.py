"""Mergeable distinct-count sketches — HyperLogLog register tables over
the events stream, built with engine-portable hashing (md5 nibbles, the
`md5_prefix_int` discipline from base.py) so the DuckDB oracle matches
bit-for-bit.

`hll_user_registers` emits the 2^8-bucket HLL register table of distinct
user_ids per event_type, PLUS the merged all-types sketch computed by
re-aggregating the per-type registers (grp = 'ALL') — the mergeability
that makes HLL the right distinct-count structure at 100 TB: shards
sketch independently, merge is a 256-key max, and no distinct-shuffle
over raw ids ever happens. The register build itself is one
map-side-combinable hash-aggregate over ≤ |event_types|·256 keys.

Everything stays in integer/string space: bucket = first byte of
md5(user_id), rho = leading-zero count of the next 56 hash bits + 1,
computed via the length of the binary string (`bin()` exists and agrees
on both engines; no log2 doubles, no boundary flips). Estimation from
the registers (harmonic mean) is left to the consumer — the test suite
checks the estimate lands within the expected HLL error of the true
distinct count.

Reference parity: deltacat has no sketch operators; this extends the
profiling surface (SURVEY.md §2 LLM-pipeline addendum) alongside
`skew_profile_orders` / `completeness_profile`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import load

_HLL_P = 8  # 2^8 = 256 buckets
_HLL_WBITS = 56  # rho window: next 14 hex chars = 56 bits


def _hex_int(h: Column, start: int, nchars: int) -> Column:
    """Hex chars [start, start+nchars) of an md5 string → bigint."""
    # Accumulate in LONG from the start — 14 nibbles reach 16^14 ≈ 7e16,
    # far past the INT accumulator `md5_prefix_int` gets away with.
    val = F.lit(0).cast("long")
    for i in range(nchars):
        nib = (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, start + i, 1))
            - F.lit(1)
        ).cast("long")
        val = val * F.lit(16) + nib
    return val


def _hex_int_sql(expr: str, start: int, nchars: int) -> str:
    parts = [
        f"(strpos('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    ]
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def hll_prep(df: DataFrame, key_col: str) -> DataFrame:
    """Append (bucket, rho) HLL columns for `key_col` — the row-level
    transform shared by the batch register build and STREAMING distinct
    sketches: because registers are a (bucket)-keyed MAX, a structured
    stream aggregates them incrementally with ordinary state (no custom
    stateful operator), and the same registers merge across shards,
    windows, or restarts."""
    h = F.md5(F.col(key_col).cast("string"))
    return df.select(
        "*",
        _hex_int(h, 1, 2).alias("bucket"),
        _hex_int(h, 3, _HLL_WBITS // 4).alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
            F.lit(_HLL_WBITS + 1) - F.length(F.expr("bin(w)"))
        ),
    ).drop("w")


def hll_user_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL(p=8) registers of distinct user_id per event_type + the
    merged 'ALL' sketch: (grp, bucket, max_rho).

    The merge path is the point: 'ALL' is computed FROM the per-type
    register table (256-key max re-aggregate), not from the raw ids —
    the same two-level motion a 1000-executor run uses (executors sketch
    their shard, the driver folds 256-int arrays)."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = (
        hll_prep(ev, "user_id")
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )
    merged = per_type.groupBy("bucket").agg(
        F.max("max_rho").cast("int").alias("max_rho")
    )
    out = per_type.select(
        F.col("event_type").alias("grp"), "bucket", "max_rho"
    ).unionByName(
        merged.select(F.lit("ALL").alias("grp"), "bucket", "max_rho")
    )
    return out.orderBy("grp", "bucket")


_W_SQL = _hex_int_sql("md5(CAST(user_id AS VARCHAR))", 3, _HLL_WBITS // 4)

HLL_SQL = f"""
WITH hashed AS (
  SELECT event_type,
         {_hex_int_sql("md5(CAST(user_id AS VARCHAR))", 1, 2)} AS bucket,
         {_W_SQL} AS w
  FROM events),
per_type AS (
  SELECT event_type, bucket,
         CAST(MAX(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                  ELSE {_HLL_WBITS + 1} - length(bin(w)) END) AS INT)
           AS max_rho
  FROM hashed GROUP BY event_type, bucket),
merged AS (
  SELECT 'ALL' AS grp, bucket, CAST(MAX(max_rho) AS INT) AS max_rho
  FROM per_type GROUP BY bucket)
SELECT event_type AS grp, bucket, max_rho FROM per_type
UNION ALL
SELECT grp, bucket, max_rho FROM merged
ORDER BY grp, bucket
"""


QUERIES = {
    "hll_user_registers": (hll_user_registers, HLL_SQL),
}
