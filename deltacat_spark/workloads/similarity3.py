"""SemDeDup-style semantic pruning and embedding second-moment
statistics — round-8 additions to the embedding-curation family.

`semdedup_prune` is the pipeline from Abbas et al. 2023 (SemDeDup):
cluster the corpus with k-means, search for near-duplicate pairs ONLY
within each cluster cell, group duplicates by connected components, and
keep one survivor per group — the member with the LOWEST cosine to its
cluster centroid (the paper's "farthest from centroid" retention rule,
which keeps the most marginal exemplar and prunes the redundant core).
The cell-local search is the scale story: pair cost is Σ|cell|², and k
grows with the corpus so cells stay bounded — never corpus×corpus.

`embedding_covariance` computes the exact (quantized-integer) covariance
numerators n·Σxᵢxⱼ − Σxᵢ·Σxⱼ for every dimension pair i ≤ j. The Spark
plan is the communication-optimal one: an Arrow-batched `mapInPandas`
computes a d×d Gram partial per batch (one BLAS matmul), so shuffle
volume is O(batches · d²) — independent of row count — and the final
reduce is over d(d+1)/2 keys. The naive dim×dim self-join (the oracle's
form) would blow each row up 2080×.

Reference parity: deltacat has no embedding-statistics operators; these
extend the training-data curation surface (SURVEY.md §2 LLM-pipeline
addendum) alongside `kmeans_assign_step` and the PQ family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import load
from deltacat_spark.workloads.similarity import _KM_SCALE, _XQ_EXPR

_TAU = 0.45  # same near-dup cosine threshold as dedup_embedding_cosine

# Salt width for the cell-local pair join (see semdedup_prune): fixed
# and small — parallelism becomes k_cells × _PAIR_SALT, while the
# shuffle replication it costs stays ≪ the Σ|cell|² pair work at any
# scale where cells outgrow the salt.
_PAIR_SALT = 16

# BIGINT dot product of two quantized arrays (exact: |xq| ~ 1e4+, 64
# terms → ≪ 2^63; doubles only appear after the integer sums).
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _assigned_with_vectors(e: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """(vec_id, cl, xq_arr, nrm2) nearest-centroid assignment over the
    label-seeded quantized centroids (same integer-exact pipeline as
    `kmeans_assign_step`), plus the ≤k-row centroid-array table."""
    ex = e.select(
        "vec_id", "label", F.posexplode(F.expr(_XQ_EXPR)).alias("dim", "xq")
    )
    cent = (
        ex.groupBy("label", "dim")
        .agg(F.sum("xq").alias("sx"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("label").alias("cl"),
            "dim",
            F.floor(F.col("sx") / F.col("n")).cast("long").alias("c"),
        )
    )
    cent_arr = cent.groupBy("cl").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)")
        .alias("c_arr")
    )
    q = e.select("vec_id", F.expr(_XQ_EXPR).alias("xq_arr"))
    scored = q.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id",
        "cl",
        "xq_arr",
        F.expr(
            "aggregate(zip_with(xq_arr, c_arr, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("dist"),
    )
    best = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cl", "xq_arr")).alias("b"))
        .select(
            "vec_id",
            F.col("b.cl").alias("cl"),
            F.col("b.xq_arr").alias("xq_arr"),
        )
        .withColumn(
            "nrm2", F.expr(_DOT.format(a="xq_arr", b="xq_arr"))
        )
    )
    return best, cent_arr


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: per-vector (cluster, duplicate-group, kept) labels.

    Pairs are generated ONLY within a k-means cell (equi-join on the
    assigned cluster — Σ|cell|² work, never corpus²), duplicate groups
    are the connected components of the ≥τ cosine graph, and each group
    keeps exactly one member: lowest centroid-cosine, vec_id tie-break.
    Singletons (no ≥τ neighbor) form their own group and are kept."""
    from deltacat_spark.operators.dedupe import connected_components

    e = load(spark, sf_dir, "embeddings", spread=True)
    best, cent_arr = _assigned_with_vectors(e)
    # cosine to own centroid: integer dots, then one double division
    with_cos = (
        best.join(F.broadcast(cent_arr), "cl")
        .withColumn("c_nrm2", F.expr(_DOT.format(a="c_arr", b="c_arr")))
        .withColumn(
            "cent_cos",
            F.round(
                F.expr(_DOT.format(a="xq_arr", b="c_arr")).cast("double")
                / (
                    F.sqrt(F.col("nrm2").cast("double"))
                    * F.sqrt(F.col("c_nrm2").cast("double"))
                ),
                6,
            ),
        )
        .select("vec_id", "cl", "xq_arr", "nrm2", "cent_cos")
    )
    # with_cos feeds BOTH self-join sides and the final label join —
    # checkpoint it once so the assignment pipeline (two exploded aggs +
    # broadcast argmin) is not re-executed per consumer (same lesson as
    # the r7 lsh_candidates restructure).
    with_cos = with_cos.localCheckpoint(eager=False)
    # Salted cell-local pair join (guide §2.5 hot keys): keyed on `cl`
    # alone the join has only k distinct keys, so ALL Σ|cell|² cosine
    # work lands on k tasks — job-profiled 3.2s in ONE task at sf0.1.
    # Salt: the probe side explodes over `_PAIR_SALT` buckets, the
    # build side hashes vec_id into its one bucket; every (a, b) pair
    # meets exactly once (at a's replica matching b's bucket), so the
    # pair set — and everything downstream — is bit-identical. Shuffle
    # pays `_PAIR_SALT`× replication of one side, orders below the
    # Σ|cell|² pair work it parallelizes (k×salt-way instead of k-way).
    a = with_cos.withColumn(
        "__pb",
        F.explode(F.array(*[F.lit(i) for i in range(_PAIR_SALT)])),
    ).alias("a")
    b = with_cos.withColumn(
        "__bb",
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(_PAIR_SALT)).cast("int"),
    ).alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cl") == F.col("b.cl"))
            & (F.col("a.__pb") == F.col("b.__bb"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cos",
            F.round(
                F.expr(_DOT.format(a="a.xq_arr", b="b.xq_arr")).cast("double")
                / (
                    F.sqrt(F.col("a.nrm2").cast("double"))
                    * F.sqrt(F.col("b.nrm2").cast("double"))
                ),
                6,
            ),
        )
        .filter(F.col("cos") >= F.lit(_TAU))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
    )
    grp = connected_components(pairs, a_col="id_a", b_col="id_b").select(
        F.col("doc_id").alias("vec_id"), F.col("cluster_id").alias("grp")
    )
    labeled = (
        with_cos.join(grp, "vec_id", "left")
        .withColumn("grp", F.coalesce(F.col("grp"), F.col("vec_id")))
        .select("vec_id", "cl", "grp", "cent_cos")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("grp").orderBy("cent_cos", "vec_id")
    return (
        labeled.withColumn("kept", F.row_number().over(w) == 1)
        .select(
            "vec_id",
            F.col("cl").cast("int").alias("cluster"),
            F.col("grp").cast("long").alias("grp"),
            "kept",
        )
        .orderBy("vec_id")
    )


SEMDEDUP_SQL = f"""
WITH RECURSIVE ex AS (
  SELECT vec_id, label, u.dim AS dim,
         CAST(FLOOR(CAST(u.x AS DOUBLE) * {_KM_SCALE} + 0.5) AS BIGINT) AS xq
  FROM embeddings, LATERAL (
    SELECT unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS dim) u),
cent AS (
  SELECT label AS cl, dim,
         CAST(FLOOR(CAST(SUM(xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM ex GROUP BY label, dim),
dist AS (
  SELECT e.vec_id, c.cl,
         CAST(SUM((e.xq - c.c) * (e.xq - c.c)) AS BIGINT) AS dist
  FROM ex e JOIN cent c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cl),
assign AS (
  SELECT vec_id, cl FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cl) AS rn
    FROM dist) WHERE rn = 1),
vq AS (
  SELECT vec_id, list(xq ORDER BY dim) AS xq_arr FROM ex GROUP BY vec_id),
carr AS (
  SELECT cl, list(c ORDER BY dim) AS c_arr FROM cent GROUP BY cl),
base AS (
  SELECT a.vec_id, a.cl, v.xq_arr,
         CAST(list_sum(list_transform(v.xq_arr, x -> x * x)) AS BIGINT)
           AS nrm2,
         ROUND(
           CAST(list_sum(list_transform(list_zip(v.xq_arr, c.c_arr),
                                        p -> p[1] * p[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(v.xq_arr, x -> x * x))
                        AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(c.c_arr, x -> x * x))
                          AS DOUBLE))), 6) AS cent_cos
  FROM assign a JOIN vq v ON a.vec_id = v.vec_id
              JOIN carr c ON a.cl = c.cl),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM base a JOIN base b ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE ROUND(
          CAST(list_sum(list_transform(list_zip(a.xq_arr, b.xq_arr),
                                       p -> p[1] * p[2])) AS DOUBLE)
          / (sqrt(CAST(a.nrm2 AS DOUBLE)) * sqrt(CAST(b.nrm2 AS DOUBLE))),
          6) >= {_TAU}),
edges AS (
  SELECT id_a AS u, id_b AS w FROM pairs
  UNION
  SELECT id_b AS u, id_a AS w FROM pairs),
walk(u, label) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
  UNION
  SELECT e.u, w2.label FROM edges e JOIN walk w2 ON e.w = w2.u),
grp AS (
  SELECT u AS vec_id, CAST(min(label) AS BIGINT) AS grp
  FROM walk GROUP BY u),
labeled AS (
  SELECT b.vec_id, b.cl, COALESCE(g.grp, b.vec_id) AS grp, b.cent_cos
  FROM base b LEFT JOIN grp g ON b.vec_id = g.vec_id)
SELECT vec_id, CAST(cl AS INT) AS cluster, grp,
       (row_number() OVER (PARTITION BY grp
                           ORDER BY cent_cos, vec_id) = 1) AS kept
FROM labeled
ORDER BY vec_id
"""


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance numerators n·Σxᵢxⱼ − Σxᵢ·Σxⱼ over quantized
    embeddings for every dimension pair i ≤ j (d(d+1)/2 = 2080 rows at
    d=64) — the one-pass sufficient statistic for PCA / whitening.

    Scale shape: each Arrow batch contributes ONE d×d integer Gram
    matrix (a BLAS matmul in numpy) plus a d-vector of sums, emitted as
    d(d+1)/2 + d + 1 partial rows; the shuffle therefore carries
    O(batches · d²) rows regardless of corpus size, and the final
    hash-agg runs over ≤2081 keys. Values stay in int64: at ~1e12 rows
    the partial sums approach 2^63 and the two final products should be
    upgraded to decimal(38,0) — noted, not needed at bench scale."""
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select("embedding")

    def gram(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            xq = np.floor(x * _KM_SCALE + 0.5).astype(np.int64)
            g = xq.T @ xq
            d = g.shape[0]
            iu, ju = np.triu_indices(d)
            out = {
                "i": np.concatenate([iu, np.arange(d), [-1]]),
                "j": np.concatenate([ju, np.full(d, -1), [-1]]),
                "v": np.concatenate(
                    [g[iu, ju], xq.sum(axis=0), [len(pdf)]]
                ),
            }
            yield pd.DataFrame(out)

    partials = e.mapInPandas(gram, "i int, j int, v long")
    tot = partials.groupBy("i", "j").agg(F.sum("v").alias("v"))
    sums = tot.filter(F.col("j") == -1).filter(F.col("i") >= 0)
    n = tot.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n")
    )
    prods = tot.filter(F.col("j") >= 0)
    si = sums.select(F.col("i").alias("i"), F.col("v").alias("sx_i"))
    sj = sums.select(F.col("i").alias("j"), F.col("v").alias("sx_j"))
    return (
        prods.join(si, "i")
        .join(sj, "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("n") * F.col("v") - F.col("sx_i") * F.col("sx_j")).alias(
                "cov_num"
            ),
        )
        .orderBy("i", "j")
    )


COVARIANCE_SQL = f"""
WITH ex AS (
  SELECT vec_id, u.dim - 1 AS dim,
         CAST(FLOOR(CAST(u.x AS DOUBLE) * {_KM_SCALE} + 0.5) AS BIGINT) AS xq
  FROM embeddings, LATERAL (
    SELECT unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS dim) u),
s AS (SELECT dim, CAST(SUM(xq) AS BIGINT) AS sx FROM ex GROUP BY dim),
n AS (SELECT COUNT(DISTINCT vec_id) AS n FROM ex),
p AS (
  SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.xq * b.xq) AS BIGINT) AS sxy
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY a.dim, b.dim)
SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
       CAST(n.n * p.sxy - si.sx * sj.sx AS BIGINT) AS cov_num
FROM p JOIN s si ON p.i = si.dim
       JOIN s sj ON p.j = sj.dim
       CROSS JOIN n
ORDER BY i, j
"""


QUERIES = {
    "semdedup_prune": (semdedup_prune, SEMDEDUP_SQL),
    "embedding_covariance": (embedding_covariance, COVARIANCE_SQL),
}
