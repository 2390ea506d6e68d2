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
    ev = load(spark, sf_dir, "events", spread=True).select("event_type", "user_id")
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


_CMS_D = 4  # hash rows
_CMS_W = 512  # columns per row (3 md5 nibbles = 4096, mod 512 is exact)


def cms_prep(df: DataFrame, key_col: str) -> DataFrame:
    """Explode each record into its `_CMS_D` (row, col) register cells —
    the row-level transform shared by the batch build and STREAMING
    frequency sketches: registers are a (row, col)-keyed SUM, so a
    structured stream maintains them with ordinary aggregate state and
    shards/windows merge by adding registers.

    One md5 per record; hash row r reads its own 3-nibble slice
    (chars 1+3r..3+3r) — the standard split-one-hash-into-d-sub-hashes
    construction, 4× cheaper than d independent digests and uniform
    per slice (4096 % 512 == 0, so the mod is unbiased)."""
    hashed = df.select(
        "*", F.md5(F.col(key_col).cast("string")).alias("_h")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (_hex_int(F.col("_h"), 1 + 3 * r, 3) % _CMS_W)
                .cast("int")
                .alias("c"),
            )
            for r in range(_CMS_D)
        ]
    )
    df = hashed.select("*", F.explode(cells).alias("_cell")).drop("_h")
    return df.select("*", "_cell.r", "_cell.c").drop("_cell")


def _cms_cells_sql(key_expr: str) -> str:
    """SQL fragment: per-record list of `_CMS_D` {r, c} cell structs."""
    h = f"md5(CAST({key_expr} AS VARCHAR))"
    cells = ", ".join(
        f"{{'r': {r}, 'c': CAST({_hex_int_sql(h, 1 + 3 * r, 3)}"
        f" % {_CMS_W} AS INT)}}"
        for r in range(_CMS_D)
    )
    return f"[{cells}]"


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=512) over lineitem part frequencies +
    the heavy-hitter evaluation: top-30 exact keys with their CMS
    estimate (min over the 4 registers) beside the true count.

    The register build is the 100 TB operator: 4 cells per record,
    map-side combine collapses every partition to ≤ 2048 partial
    sums, and the final shuffle moves 2048 keys no matter the corpus
    size — no per-key distinct table ever materializes. The exact
    top-30 beside it is the evaluation harness (same pattern as
    `ann_recall_eval`): at production scale the candidate set comes
    from a sample or a prior sketch, and the CMS point-query is the
    same 4-register min. CMS never underestimates — `cms_est ≥
    exact_cnt` is asserted in tests."""
    li = load(spark, sf_dir, "lineitem", spread=True).select("l_partkey")
    reg = (
        cms_prep(li, "l_partkey")
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    cand = exact.orderBy(F.desc("exact_cnt"), "l_partkey").limit(30)
    # Point queries as an equi-join: expand each candidate into its 4
    # (r, c) cells and hash-join the (tiny, broadcast) register table.
    est = (
        cms_prep(cand, "l_partkey")
        .join(F.broadcast(reg), ["r", "c"])
        .groupBy("l_partkey", "exact_cnt")
        .agg(F.min("n").alias("cms_est"))
    )
    return est.select("l_partkey", "exact_cnt", "cms_est").orderBy(
        F.desc("exact_cnt"), "l_partkey"
    )


CMS_SQL = f"""
WITH reg AS (
  SELECT u.cell.r AS r, u.cell.c AS c, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem, unnest({_cms_cells_sql("l_partkey")}) AS u(cell)
  GROUP BY 1, 2),
exact AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM lineitem GROUP BY 1),
cand AS (
  SELECT l_partkey, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, l_partkey LIMIT 30),
cells AS (
  SELECT cand.l_partkey, cand.exact_cnt, u.cell.r AS r, u.cell.c AS c
  FROM cand, unnest({_cms_cells_sql("cand.l_partkey")}) AS u(cell))
SELECT cells.l_partkey, cells.exact_cnt,
       CAST(MIN(reg.n) AS BIGINT) AS cms_est
FROM cells JOIN reg ON reg.r = cells.r AND reg.c = cells.c
GROUP BY cells.l_partkey, cells.exact_cnt
ORDER BY exact_cnt DESC, l_partkey
"""


def quantile_sketch_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log-histogram quantile sketch over order prices:
    per-priority power-of-two bucket registers, the merged 'ALL'
    sketch re-aggregated FROM the per-group registers, and p50/p90/p99
    answered from the registers — (grp, p, bucket, lo, hi).

    The sketch is ~64 counters per group (one per bit-length), built
    by one map-side-combinable hash-aggregate; merge is a counter
    SUM, so shards/streams/windows combine without ever re-reading
    rows — the property that replaces a global sort-based percentile
    at 100 TB. Guaranteed ≤ 2× relative error on the value (a bucket
    spans one doubling); everything stays in integer space (floor →
    bit length via `bin()`, identical on both engines)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    base = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.length(F.bin(F.floor("o_totalprice").cast("long")))
        .cast("int")
        .alias("bucket"),
    )
    reg0 = base.groupBy("grp", "bucket").agg(F.count(F.lit(1)).alias("n"))
    reg = reg0.unionByName(
        reg0.groupBy("bucket").agg(F.sum("n").alias("n")).select(
            F.lit("ALL").alias("grp"), "bucket", "n"
        )
    )
    from pyspark.sql import Window

    w_cum = Window.partitionBy("grp").orderBy("bucket")
    w_tot = Window.partitionBy("grp")
    cum = reg.select(
        "grp",
        "bucket",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("tot"),
    )
    ps = F.explode(F.array(F.lit(500), F.lit(900), F.lit(990)))
    hits = (
        cum.select("*", ps.alias("p"))
        .filter(F.col("cum") * 1000 >= F.col("p") * F.col("tot"))
        .groupBy("grp", "p")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hits.select(
        "grp",
        F.col("p").cast("int").alias("p"),
        F.col("bucket").cast("int").alias("bucket"),
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)").alias("lo"),
        (F.expr("shiftleft(CAST(1 AS BIGINT), bucket)") - 1).alias("hi"),
    ).orderBy("grp", "p")


QUANTILE_SQL = """
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST(length(bin(CAST(FLOOR(o_totalprice) AS BIGINT))) AS INT)
           AS bucket
  FROM orders),
reg0 AS (
  SELECT grp, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY 1, 2),
reg AS (
  SELECT * FROM reg0
  UNION ALL
  SELECT 'ALL' AS grp, bucket, CAST(SUM(n) AS BIGINT) AS n
  FROM reg0 GROUP BY bucket),
cum AS (
  SELECT grp, bucket,
         SUM(n) OVER (PARTITION BY grp ORDER BY bucket) AS cum,
         SUM(n) OVER (PARTITION BY grp) AS tot
  FROM reg),
hits AS (
  SELECT c.grp, ps.p, MIN(c.bucket) AS bucket
  FROM cum c, (SELECT unnest([500, 900, 990]) AS p) ps
  WHERE c.cum * 1000 >= ps.p * c.tot
  GROUP BY 1, 2)
SELECT grp, CAST(p AS INT) AS p, CAST(bucket AS INT) AS bucket,
       CAST(CAST(1 AS BIGINT) << (bucket - 1) AS BIGINT) AS lo,
       CAST((CAST(1 AS BIGINT) << bucket) - 1 AS BIGINT) AS hi
FROM hits
ORDER BY grp, p
"""


QUERIES = {
    "hll_user_registers": (hll_user_registers, HLL_SQL),
    "cms_heavy_hitters": (cms_heavy_hitters, CMS_SQL),
    "quantile_sketch_prices": (quantile_sketch_prices, QUANTILE_SQL),
}
