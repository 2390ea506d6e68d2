"""Embedding-similarity inventory over the `embeddings` table.

Approximate-nearest-neighbor surface for the training-data pipeline:
brute-force cosine top-k (the exactness baseline), kNN label voting, and
per-label norm statistics. Dot products are index-ordered double folds on
both engines so cosine values hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.functions.vectors import l2_norm
from deltacat_spark.operators.similarity import brute_force_topk, knn_label_vote
from deltacat_spark.workloads.base import cnt, cnt_sql, load

# DuckDB fragments: norm + cosine as index-ordered folds (bit-identical
# to Spark's zip_with/aggregate).
_NORM_SQL = "sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))"
_DOT_SQL = (
    "list_sum(list_transform(list_zip(q_vec, c_vec),"
    " p -> p[1]::DOUBLE * p[2]::DOUBLE))"
)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    return brute_force_topk(candidates, queries, k=5)


ANN_TOPK_SQL = f"""
WITH v AS (SELECT vec_id, embedding, {_NORM_SQL} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm FROM v WHERE vec_id < 10),
c AS (SELECT vec_id AS cand_id, embedding AS c_vec, nrm AS c_nrm FROM v WHERE vec_id >= 10),
s AS (SELECT q_id, cand_id, {_DOT_SQL} / (q_nrm * c_nrm) AS cos_raw FROM c CROSS JOIN q)
SELECT q_id, cand_id, ROUND(cos_raw, 6) AS cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_raw DESC, cand_id ASC) AS rn
      FROM s)
WHERE rn <= 5
"""


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    topk = brute_force_topk(candidates, queries, k=10)
    return knn_label_vote(topk, e)


KNN_SQL = f"""
WITH v AS (SELECT vec_id, label, embedding, {_NORM_SQL} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm FROM v WHERE vec_id < 10),
c AS (SELECT vec_id AS cand_id, label, embedding AS c_vec, nrm AS c_nrm FROM v WHERE vec_id >= 10),
s AS (SELECT q_id, cand_id, label, {_DOT_SQL} / (q_nrm * c_nrm) AS cos_raw FROM c CROSS JOIN q),
topk AS (SELECT q_id, cand_id, label
         FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                            ORDER BY cos_raw DESC, cand_id ASC) AS rn
               FROM s)
         WHERE rn <= 10),
votes AS (SELECT q_id, label, count(*) AS votes FROM topk GROUP BY q_id, label)
SELECT q_id, label AS predicted_label, CAST(votes AS BIGINT) AS votes
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY votes DESC, label ASC) AS rn
      FROM votes)
WHERE rn = 1
"""


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    n = e.select("label", l2_norm(F.col("embedding")).alias("nrm"))
    return n.groupBy("label").agg(
        cnt("n_vectors"),
        F.round(
            F.sum(F.col("nrm").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


NORM_STATS_SQL = f"""
SELECT label, {cnt_sql('n_vectors')},
  ROUND(CAST(SUM(CAST(nrm AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6) AS avg_norm,
  ROUND(MIN(nrm), 6) AS min_norm,
  ROUND(MAX(nrm), 6) AS max_norm
FROM (SELECT label, {_NORM_SQL} AS nrm FROM embeddings)
GROUP BY label
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (the scale path — see
    `operators.similarity.lsh_topk`): same-bucket candidates only."""
    from deltacat_spark.operators.similarity import lsh_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    return lsh_topk(candidates, queries, k=5, n_planes=4)


def _lsh_sql() -> str:
    from deltacat_spark.operators.similarity import hyperplanes

    planes = hyperplanes(64, 4)
    dots = []
    for p in planes:
        arr = "[" + ", ".join(f"{x}::DOUBLE" for x in p) + "]"
        dots.append(
            "list_sum(list_transform(list_zip(embedding, "
            + arr
            + "), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
        )
    bucket = "0"
    for d in dots:
        bucket = f"({bucket}) * 2 + (CASE WHEN {d} >= 0 THEN 1 ELSE 0 END)"
    return f"""
WITH v AS (
  SELECT vec_id, embedding, {_NORM_SQL} AS nrm, {bucket} AS bucket
  FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm, bucket
      FROM v WHERE vec_id < 10),
c AS (SELECT vec_id AS cand_id, embedding AS c_vec, nrm AS c_nrm, bucket
      FROM v WHERE vec_id >= 10),
s AS (SELECT q_id, cand_id, {_DOT_SQL} / (q_nrm * c_nrm) AS cos_raw
      FROM c JOIN q USING (bucket))
SELECT q_id, cand_id, ROUND(cos_raw, 6) AS cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos_raw DESC, cand_id ASC) AS rn
      FROM s)
WHERE rn <= 5
"""


ANN_LSH_SQL = _lsh_sql()


def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: probe all buckets at Hamming distance ≤ 1 —
    recall recovery at bounded extra fan-out."""
    from deltacat_spark.operators.similarity import lsh_topk

    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    return lsh_topk(candidates, queries, k=5, n_planes=4, multiprobe=True)


def _lsh_multiprobe_sql() -> str:
    base = _lsh_sql()
    # queries probe xor-flipped buckets; candidates keep their own bucket
    return base.replace(
        "q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm, bucket\n      FROM v WHERE vec_id < 10),",
        """q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm,
             xor(bucket, flip) AS bucket
      FROM v CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8]) AS flip)
      WHERE vec_id < 10),""",
    )


ANN_LSH_MULTIPROBE_SQL = _lsh_multiprobe_sql()


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_TOPK_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_SQL),
    "ann_lsh_multiprobe": (ann_lsh_multiprobe, ANN_LSH_MULTIPROBE_SQL),
    "knn_classify": (knn_classify, KNN_SQL),
    "embedding_norm_stats": (embedding_norm_stats, NORM_STATS_SQL),
}
