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
    return spark.createDataFrame(
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
