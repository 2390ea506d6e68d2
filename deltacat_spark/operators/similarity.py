"""Embedding similarity search: brute-force cosine top-k + kNN vote.

Baseline ANN surface for the training-data pipeline (the reference has
no vector ops). Structure for scale:

* Norms are computed per row *before* the join (O(n) work), so the
  query×candidate join does only the dot product.
* The query side is broadcast — candidates never shuffle.
* Top-k is a per-query window over the (small) q×n result.

The scale path beyond brute force (LSH / IVF bucketing so each query
only meets one bucket) reuses `operators.dedupe.lsh_candidates`-style
band joins; brute force stays the exactness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from deltacat_spark.functions.vectors import dot, l2_norm


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", l2_norm(F.col(vec_col)))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Returns (q_id, cand_id, cosine, rank). Deterministic tie-break on
    candidate id.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "cand_id",
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias(
            "cos_raw"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cand_id", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


def hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH.

    Components derive from md5(plane:i) so Spark, DuckDB oracles, and
    any other engine can reproduce the exact same planes without a
    shared RNG.
    """
    import hashlib

    planes = []
    for p in range(n_planes):
        v = []
        for i in range(dim):
            h = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
            # uniform in [-1, 1) from the first 8 hex chars
            v.append(round(int(h[:8], 16) / float(2**31) - 1.0, 6))
        planes.append(v)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit b = (dot(vec, plane_b) >= 0)."""
    bucket = F.lit(0)
    for plane in planes:
        d = dot(vec, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket * 2 + F.when(d >= 0, 1).otherwise(0)
    return bucket


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """Bucketed ANN — the scale path past brute force.

    Both sides bucket by sign-LSH; the similarity join only compares
    pairs in the same bucket, an equi-join on the bucket id. With B
    buckets the candidate set shrinks ~B×: at 100 TB this turns the
    O(n·q) cross join into a shuffle-partitioned join keyed by bucket
    (multi-probe = union of per-plane bit flips, not implemented here).
    Returns (q_id, cand_id, cosine, rank) — approximate: neighbors in
    other buckets are missed, by design.
    """
    dim = 64
    planes = hyperplanes(dim, n_planes)
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    if multiprobe:
        # Probe every bucket at Hamming distance ≤ 1 (flip each sign
        # bit): recall recovers near-boundary neighbors at (n_planes+1)×
        # query fan-out — still a bucket equi-join, never a cross join.
        flips = F.array(
            F.lit(0), *[F.lit(1 << b) for b in range(n_planes)]
        )
        q = q.withColumn("__flip", F.explode(flips)).withColumn(
            "bucket", F.col("bucket").bitwiseXOR(F.col("__flip"))
        ).drop("__flip")
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "q_id",
        "cand_id",
        (
            dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm"))
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "cand_id", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


def knn_label_vote(
    topk: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Majority label among each query's neighbors (ties → smaller label)."""
    joined = topk.join(
        labels.select(F.col(id_col).alias("cand_id"), label_col), "cand_id"
    )
    counts = joined.groupBy("q_id", label_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), F.asc(label_col))
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("q_id", F.col(label_col).alias("predicted_label"), "votes")
    )
