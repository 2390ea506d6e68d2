"""Top principal component by fixed-point power iteration — closes the
loop opened by `embedding_covariance` (similarity3.py): covariance is
the distributed sufficient statistic; the eigen-solve on the d×d matrix
is driver-side, exactly as Spark MLlib's
`RowMatrix.computePrincipalComponents` collects the Gram matrix before
calling LAPACK. The collect is bounded by d² (4096 values at d=64) —
dimension-sized, never row-count-sized.

Determinism across engines: every step is integer arithmetic. The
covariance numerators are exact int64; they are re-quantized to a
permille matrix (half-up rounding via the `(2·a·S + m) // (2·m)`
identity — exact big-int on the driver, HUGEINT in DuckDB), and each
power-iteration step renormalizes the iterate to max-abs = 1e5 with the
same integer formula. Truncating division (`DIV` / `//`) matches on
both engines, so the oracle's four unrolled matvec CTEs reproduce the
driver loop bit-for-bit.

Reference parity: deltacat has no linear-algebra operators; this extends
the embedding-curation surface (PCA/whitening prep for SemDeDup-style
pipelines, SURVEY.md §2 LLM-pipeline addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deltacat_spark.localdf import local_df

from deltacat_spark.workloads.similarity3 import (
    COVARIANCE_SQL,
    embedding_covariance,
)

_PI_ITERS = 4
_AQ_SCALE = 1000  # covariance → permille of its max-abs entry
_V_SCALE = 100_000  # iterate renormalized to max-abs = 1e5 each step


def _half_up_ratio(a: int, scale: int, m: int) -> int:
    """round-half-up(a·scale / m) for ints, sign-symmetric (away from
    zero) — matches Spark/DuckDB ROUND semantics without ever touching
    a double."""
    q = (2 * abs(a) * scale + m) // (2 * m)
    return -q if a < 0 else q


def pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four power-iteration steps toward the leading eigenvector of the
    embedding covariance, as 1e5-scaled integer loadings: (dim,
    loading), sign-normalized so the first nonzero loading is positive.

    This is the per-iteration KERNEL (like `kmeans_assign_step`): a
    production run loops it to convergence, with iteration count set by
    the eigengap — the synthetic embeddings are near-isotropic (top-two
    eigenvalue ratio ≈ 0.93), so four steps demonstrate the kernel and
    measurably increase the Rayleigh quotient without claiming full
    convergence (`tests/test_graph_sketch_pca.py` asserts the
    monotone-improvement invariant that holds for any PSD matrix).

    Scale shape: the only data-sized work is `embedding_covariance`
    (O(batches·d²) shuffle, row-count independent); everything after is
    O(d²) driver math over 2080 collected values — the same division of
    labor as MLlib PCA. Four iterations from the all-ones vector; the
    max-abs renormalization keeps every product within exact-int range
    (|A| ≤ 1e3, |v| ≤ 1e5, d=64 → |w| ≤ 6.4e9 ≪ 2^63)."""
    cov = embedding_covariance(spark, sf_dir).collect()  # d(d+1)/2 rows
    entries: dict[tuple[int, int], int] = {}
    dims = 0
    for row in cov:
        entries[(row["i"], row["j"])] = row["cov_num"]
        entries[(row["j"], row["i"])] = row["cov_num"]
        dims = max(dims, row["j"] + 1)
    m = max(abs(v) for v in entries.values())
    aq = {k: _half_up_ratio(v, _AQ_SCALE, m) for k, v in entries.items()}
    v = [_V_SCALE] * dims
    for _ in range(_PI_ITERS):
        w = [
            sum(aq.get((i, j), 0) * v[j] for j in range(dims))
            for i in range(dims)
        ]
        mw = max(abs(x) for x in w)
        if mw == 0:  # degenerate zero matrix — keep the previous iterate
            break
        v = [_half_up_ratio(x, _V_SCALE, mw) for x in w]
    first = next((x for x in v if x != 0), 1)
    if first < 0:
        v = [-x for x in v]
    return local_df(spark,
        [(i, v[i]) for i in range(dims)], "dim int, loading bigint"
    ).orderBy("dim")


def _pi_iter_sql(prev: str, out: str) -> str:
    return f"""w_{out} AS (
  SELECT a.i AS dim, CAST(SUM(a.aq * p.v) AS BIGINT) AS w
  FROM aq a JOIN {prev} p ON a.j = p.dim
  GROUP BY a.i),
m_{out} AS (SELECT MAX(ABS(w)) AS m FROM w_{out}),
{out} AS (
  SELECT dim,
         CAST(CASE WHEN w < 0
              THEN -((2 * (-w) * {_V_SCALE} + m.m) // (2 * m.m))
              ELSE (2 * w * {_V_SCALE} + m.m) // (2 * m.m)
         END AS BIGINT) AS v
  FROM w_{out}, m_{out} m)"""


# The oracle recomputes the covariance (COVARIANCE_SQL re-used verbatim
# as a CTE body) and then unrolls the same four fixed-point iterations.
PCA_SQL = f"""
WITH cov AS ({COVARIANCE_SQL.replace("ORDER BY i, j", "")}),
full_m AS (
  SELECT i, j, cov_num FROM cov
  UNION ALL
  SELECT j AS i, i AS j, cov_num FROM cov WHERE i <> j),
mx AS (SELECT MAX(ABS(cov_num)) AS m FROM full_m),
aq AS (
  SELECT i, j,
         CAST(CASE WHEN cov_num < 0
              THEN -((2 * CAST(-cov_num AS HUGEINT) * {_AQ_SCALE} + m.m)
                     // (2 * CAST(m.m AS HUGEINT)))
              ELSE (2 * CAST(cov_num AS HUGEINT) * {_AQ_SCALE} + m.m)
                   // (2 * CAST(m.m AS HUGEINT))
         END AS BIGINT) AS aq
  FROM full_m, mx m),
v0 AS (
  SELECT DISTINCT i AS dim, CAST({_V_SCALE} AS BIGINT) AS v FROM full_m),
{_pi_iter_sql("v0", "v1")},
{_pi_iter_sql("v1", "v2")},
{_pi_iter_sql("v2", "v3")},
{_pi_iter_sql("v3", "v4")},
sgn AS (
  SELECT CASE WHEN (
    SELECT v FROM v4 WHERE dim = (SELECT MIN(dim) FROM v4 WHERE v <> 0)
  ) < 0 THEN -1 ELSE 1 END AS s)
SELECT CAST(v4.dim AS INT) AS dim, CAST(v4.v * sgn.s AS BIGINT) AS loading
FROM v4, sgn
ORDER BY dim
"""


QUERIES = {
    "pca_power_iter": (pca_power_iter, PCA_SQL),
}


def kmeans_lloyd_iters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two FULL Lloyd iterations (assign → recompute, twice), returning
    the final centroid table (cluster, dim, c) — the iterative
    counterpart of `kmeans_assign_step`, label-seeded and integer-exact
    on both engines.

    Scale shape per iteration: the ≤k centroid arrays broadcast into a
    zip_with/aggregate fold (no N×D×K explode — the oracle's join form
    is the shape this plan avoids), assignment is a per-vector argmin
    hash-agg, and the centroid recompute is one (cluster, dim)-keyed
    aggregation over the exploded quantized vectors. The driver loop
    re-runs the same plan with the new labels; clusters emptied by an
    assignment drop out in both engines identically. floor(sum/n)
    double division is exact (< 2^53) before the floor."""
    from pyspark.sql import functions as F

    from deltacat_spark.workloads.base import load
    from deltacat_spark.workloads.similarity import _XQ_EXPR

    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode(F.expr(_XQ_EXPR)).alias("dim", "xq")
    ).localCheckpoint(eager=False)
    q = e.select("vec_id", F.expr(_XQ_EXPR).alias("xq_arr")).localCheckpoint(
        eager=False
    )
    labels = e.select("vec_id", F.col("label").cast("long").alias("cl"))
    cent_arr = None
    for _ in range(2):
        cent = (
            ex.join(labels, "vec_id")
            .groupBy("cl", "dim")
            .agg(F.sum("xq").alias("sx"), F.count(F.lit(1)).alias("n"))
            .select(
                "cl",
                "dim",
                F.floor(F.col("sx") / F.col("n")).cast("long").alias("c"),
            )
        )
        cent_arr = cent.groupBy("cl").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, c))), s -> s.c)"
            ).alias("c_arr")
        )
        scored = q.crossJoin(F.broadcast(cent_arr)).select(
            "vec_id",
            "cl",
            F.expr(
                "aggregate(zip_with(xq_arr, c_arr, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dist"),
        )
        labels = (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cl")).alias("b"))
            .select("vec_id", F.col("b.cl").alias("cl"))
        )
    final = (
        ex.join(labels, "vec_id")
        .groupBy("cl", "dim")
        .agg(F.sum("xq").alias("sx"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("cl").cast("int").alias("cluster"),
            F.col("dim").cast("int").alias("dim"),
            F.floor(F.col("sx") / F.col("n")).cast("long").alias("c"),
        )
    )
    return final.orderBy("cluster", "dim")


def _lloyd_sql_iter(labels: str, out_cent: str, out_assign: str) -> str:
    return f"""{out_cent} AS (
  SELECT l.cl, e.dim,
         CAST(FLOOR(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM ex e JOIN {labels} l ON e.vec_id = l.vec_id
  GROUP BY l.cl, e.dim),
d_{out_assign} AS (
  SELECT e.vec_id, c.cl,
         CAST(SUM((e.xq - c.c) * (e.xq - c.c)) AS BIGINT) AS dist
  FROM ex e JOIN {out_cent} c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cl),
{out_assign} AS (
  SELECT vec_id, cl FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cl) AS rn
    FROM d_{out_assign}) WHERE rn = 1)"""


def _kmeans_lloyd_sql() -> str:
    from deltacat_spark.workloads.similarity import _KM_SCALE

    return f"""
WITH ex AS (
  -- dim is an OUTPUT column here: 0-base it to match Spark posexplode
  -- (generate_subscripts is 1-based)
  SELECT vec_id, u.dim - 1 AS dim,
         CAST(FLOOR(CAST(u.x AS DOUBLE) * {_KM_SCALE} + 0.5) AS BIGINT) AS xq
  FROM embeddings, LATERAL (
    SELECT unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS dim) u),
l0 AS (SELECT vec_id, CAST(label AS BIGINT) AS cl FROM embeddings),
{_lloyd_sql_iter("l0", "cent1", "a1")},
{_lloyd_sql_iter("a1", "cent2", "a2")}
SELECT CAST(l.cl AS INT) AS cluster, CAST(e.dim AS INT) AS dim,
       CAST(FLOOR(CAST(SUM(e.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
FROM ex e JOIN a2 l ON e.vec_id = l.vec_id
GROUP BY l.cl, e.dim
ORDER BY cluster, dim
"""


KMEANS_LLOYD_SQL = _kmeans_lloyd_sql()

QUERIES["kmeans_lloyd_iters"] = (kmeans_lloyd_iters, KMEANS_LLOYD_SQL)


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the sign-LSH index against the exact brute-force
    answer, per query: (q_id, n_hits, recall_permille) — the evaluation
    harness every approximate index needs before it replaces the exact
    scan in production.

    Scale shape: the expensive side (brute force) is already the
    measured baseline operator; the comparison itself is a 50-row join.
    At 100 TB the same query runs with a SAMPLED query set — recall is
    a statistic, the sample bounds its error, and the harness shape
    (two candidate pipelines joined on (q_id, cand_id)) is unchanged.
    Integer output only: n_hits·200 permille, no float comparisons."""
    from pyspark.sql import functions as F

    from deltacat_spark.operators.similarity import brute_force_topk, lsh_topk
    from deltacat_spark.workloads.base import load

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    brute = brute_force_topk(candidates, queries, k=5).select(
        "q_id", "cand_id"
    )
    approx = lsh_topk(candidates, queries, k=5, n_planes=4).select(
        "q_id", "cand_id"
    )
    hits = (
        brute.join(approx, ["q_id", "cand_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qids = brute.select("q_id").distinct()
    return (
        qids.join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) * 200)
            .cast("int")
            .alias("recall_permille"),
        )
        .orderBy("q_id")
    )


def _recall_sql() -> str:
    from deltacat_spark.workloads.similarity import ANN_TOPK_SQL, ANN_LSH_SQL

    brute = ANN_TOPK_SQL.strip().rstrip()
    lsh = ANN_LSH_SQL.strip().rstrip()
    return f"""
WITH brute AS ({brute}),
lsh AS ({lsh}),
hits AS (
  SELECT b.q_id, CAST(COUNT(*) AS INT) AS n_hits
  FROM brute b JOIN lsh l ON b.q_id = l.q_id AND b.cand_id = l.cand_id
  GROUP BY b.q_id)
SELECT q.q_id, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) * 200 AS INT) AS recall_permille
FROM (SELECT DISTINCT q_id FROM brute) q LEFT JOIN hits h ON q.q_id = h.q_id
ORDER BY q.q_id
"""


ANN_RECALL_SQL = _recall_sql()

QUERIES["ann_recall_eval"] = (ann_recall_eval, ANN_RECALL_SQL)
