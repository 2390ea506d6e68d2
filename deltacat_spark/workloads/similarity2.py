"""Product quantization (PQ) for the ANN family — the memory-scale path
(Jégou et al. 2011): 64-dim vectors → M=8 subvectors × K=16 codes, so a
vector's index footprint drops from 256 bytes to 8 half-bytes (+ a
≤128-row codebook), and query scoring becomes table lookups.

Codebooks are DETERMINISTIC (engine-reproducible, like
`kmeans_assign_step`'s label-seeded centroids): each subvector is
seeded into one of 16 cells by the sign bits of its first four
quantized coordinates (a 4-hyperplane LSH init), and the cell's
floor-mean is one k-means step over that init. All arithmetic is
integer-quantized (1e3-scaled BIGINT) so both engines produce
bit-identical codes and distances.

Scale shape: one dim-explode (N×64 rows, map-side combinable aggs), a
≤128-row broadcast codebook, an N×(M·K)≤N×128 scored join, and an
exact rerank that touches only the 64-vector shortlist — never a
pairwise anything. At 100 TB the codebook is still ≤128 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import load

_SCALE = 1000  # same 1e3 quantization as kmeans_assign_step
_M = 8  # subvectors
_D_SUB = 8  # dims per subvector (64 / 8)
_XQ = (
    f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {_SCALE}"
    " + 0.5) AS BIGINT))"
)
# subvector rows: (vec_id, sub, sq = the 8-dim quantized slice)
_SUBS = (
    f"posexplode(transform(sequence(0, {_M - 1}),"
    f" s -> slice({_XQ}, s * {_D_SUB} + 1, {_D_SUB})))"
)
# 4-hyperplane sign seed over the subvector's first four coordinates
_SEED = (
    "CAST(CASE WHEN sq[0] >= 0 THEN 8 ELSE 0 END"
    " + CASE WHEN sq[1] >= 0 THEN 4 ELSE 0 END"
    " + CASE WHEN sq[2] >= 0 THEN 2 ELSE 0 END"
    " + CASE WHEN sq[3] >= 0 THEN 1 ELSE 0 END AS INT)"
)


def _codebook(e: DataFrame) -> DataFrame:
    """(sub, code, c_arr): floor-mean centroid per sign-seeded cell —
    ≤ M·K = 128 rows, each a D_SUB=8-long array."""
    subs = e.select(F.expr(_SUBS).alias("sub", "sq")).withColumn(
        "code", F.expr(_SEED)
    )
    exd = subs.select(
        "sub", "code", F.posexplode(F.col("sq")).alias("dim", "xq")
    )
    cent = (
        exd.groupBy("sub", "code", "dim")
        .agg(F.sum("xq").alias("sx"), F.count(F.lit(1)).alias("n"))
        .select(
            "sub",
            "code",
            "dim",
            F.floor(F.col("sx") / F.col("n")).cast("long").alias("c"),
        )
    )
    return cent.groupBy("sub", "code").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)")
        .alias("c_arr")
    )


def _codes(e: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, sub, code, dist): nearest-centroid assignment per
    subvector — N·M rows joined against the broadcast codebook."""
    subs = e.select("vec_id", F.expr(_SUBS).alias("sub", "sq"))
    scored = subs.join(F.broadcast(cb), "sub").select(
        "vec_id",
        "sub",
        "code",
        F.expr(
            "aggregate(zip_with(sq, c_arr, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("d"),
    )
    best = scored.groupBy("vec_id", "sub").agg(
        F.min(F.struct("d", "code")).alias("b")
    )
    return best.select(
        "vec_id", "sub", F.col("b.code").alias("code"), F.col("b.d").alias("d")
    )


def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector's PQ code word (M=8 codes in subvector order,
    canonical comma-joined string per the driver output contract)."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    cb = _codebook(e)
    codes = _codes(e, cb)
    return (
        codes.groupBy("vec_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(sub, code))),"
                " s -> CAST(s.code AS STRING)), ',')"
            ).alias("codes")
        )
        .orderBy("vec_id")
    )


_PQ_CTES = f"""
ex AS (
  SELECT vec_id, u.sub AS sub, u.dim AS dim,
         CAST(FLOOR(CAST(u.x AS DOUBLE) * {_SCALE} + 0.5) AS BIGINT) AS xq
  FROM embeddings, LATERAL (
    SELECT unnest(embedding) AS x,
           (generate_subscripts(embedding, 1) - 1) // {_D_SUB} AS sub,
           (generate_subscripts(embedding, 1) - 1) % {_D_SUB} AS dim) u),
seeds AS (
  SELECT vec_id, sub,
         CAST(SUM(CASE WHEN dim = 0 AND xq >= 0 THEN 8
                       WHEN dim = 1 AND xq >= 0 THEN 4
                       WHEN dim = 2 AND xq >= 0 THEN 2
                       WHEN dim = 3 AND xq >= 0 THEN 1
                       ELSE 0 END) AS INT) AS code
  FROM ex WHERE dim < 4 GROUP BY vec_id, sub),
cent AS (
  SELECT e.sub, s.code, e.dim,
         CAST(FLOOR(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM ex e JOIN seeds s ON e.vec_id = s.vec_id AND e.sub = s.sub
  GROUP BY e.sub, s.code, e.dim),
scored AS (
  SELECT e.vec_id, e.sub, c.code,
         CAST(SUM((e.xq - c.c) * (e.xq - c.c)) AS BIGINT) AS d
  FROM ex e JOIN cent c ON e.sub = c.sub AND e.dim = c.dim
  GROUP BY e.vec_id, e.sub, c.code),
assigned AS (
  SELECT vec_id, sub, code, d
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                     ORDER BY d, code) AS rn
        FROM scored)
  WHERE rn = 1)
"""

PQ_CODES_SQL = f"""
WITH {_PQ_CTES}
SELECT vec_id,
       string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub) AS codes
FROM assigned
GROUP BY vec_id
ORDER BY vec_id
"""


_SHORTLIST = 64  # PQ candidates exact-reranked per query


def ann_pq_topk(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """PQ search with exact rerank (the IVFADC serving shape): the
    query (vec_id 0) scores each subvector against every centroid ONCE
    (an M·K≤128-entry lookup table), every database vector's APPROX
    distance is the sum of 8 table lookups on its code word — the scan
    never touches raw vectors — then only the top-`_SHORTLIST`
    shortlist is reranked by exact integer L2. Returns top-k by
    (dist, vec_id), so result quality equals exact search whenever the
    true neighbors land in the shortlist (on clustered real embeddings
    they do; on this near-uniform synthetic corpus the shortlist recall
    is the measured ceiling — `tests/test_pq.py`)."""
    e = load(spark, sf_dir, "embeddings", spread=True)
    cb = _codebook(e)
    codes = _codes(e, cb)
    qsubs = (
        e.filter(F.col("vec_id") == 0)
        .select(F.expr(_SUBS).alias("sub", "sq"))
    )
    lut = qsubs.join(F.broadcast(cb), "sub").select(
        "sub",
        "code",
        F.expr(
            "aggregate(zip_with(sq, c_arr, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("qd"),
    )
    shortlist = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(lut), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd").alias("approx_dist"))
        .orderBy("approx_dist", "vec_id")
        .limit(_SHORTLIST)
    )
    qx = e.filter(F.col("vec_id") == 0).select(F.expr(_XQ).alias("qx"))
    exact = (
        e.join(F.broadcast(shortlist.select("vec_id")), "vec_id")
        .crossJoin(F.broadcast(qx))
        .select(
            "vec_id",
            F.expr(
                f"aggregate(zip_with({_XQ}, qx, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dist"),
        )
    )
    return exact.orderBy("dist", "vec_id").limit(k)


ANN_PQ_SQL = f"""
WITH {_PQ_CTES},
qlut AS (
  SELECT e.sub, c.code,
         CAST(SUM((e.xq - c.c) * (e.xq - c.c)) AS BIGINT) AS qd
  FROM ex e JOIN cent c ON e.sub = c.sub AND e.dim = c.dim
  WHERE e.vec_id = 0
  GROUP BY e.sub, c.code),
shortlist AS (
  SELECT a.vec_id, CAST(SUM(q.qd) AS BIGINT) AS approx_dist
  FROM assigned a JOIN qlut q ON a.sub = q.sub AND a.code = q.code
  WHERE a.vec_id != 0
  GROUP BY a.vec_id
  ORDER BY approx_dist, vec_id
  LIMIT {_SHORTLIST})
SELECT e.vec_id,
       CAST(SUM((e.xq - qe.xq) * (e.xq - qe.xq)) AS BIGINT) AS dist
FROM ex e
JOIN shortlist s ON e.vec_id = s.vec_id
JOIN ex qe ON qe.vec_id = 0 AND qe.sub = e.sub AND qe.dim = e.dim
GROUP BY e.vec_id
ORDER BY dist, e.vec_id
LIMIT 10
"""


QUERIES = {
    "embedding_pq_codes": (embedding_pq_codes, PQ_CODES_SQL),
    "ann_pq_topk": (ann_pq_topk, ANN_PQ_SQL),
}
