"""Bucketed all-pairs cosine dedup (`cosine_dedup_pairs`) + vector-dim
derivation: the banded sign-LSH candidate path must reproduce the
brute-force pair set (precision 1.0 by construction; recall via the
OR-amplified band count) and its plan must be a bucket equi-join, never
a BroadcastNestedLoopJoin."""

from pyspark.sql import functions as F

from deltacat_spark.operators.similarity import (
    cosine_dedup_pairs,
    lsh_topk,
    vec_dim,
)
from deltacat_spark.workloads.base import load

SF_DIR = "/root/testdata/sf0.01"


def _brute_pairs(spark, vectors, threshold):
    from deltacat_spark.functions.vectors import dot, l2_norm

    v = vectors.select(
        F.col("vec_id").alias("id"),
        "embedding",
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    a = v.select(
        F.col("id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return {
        (r.id_a, r.id_b)
        for r in pairs.withColumn("c", F.round(cos, 6))
        .filter(F.col("c") >= threshold)
        .collect()
    }


def test_bucketed_pairs_match_brute_force(spark):
    e = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 300)
    truth = _brute_pairs(spark, e, 0.45)
    got = {
        (r.id_a, r.id_b)
        for r in cosine_dedup_pairs(e, 0.45, n_bands=16, band_planes=2).collect()
    }
    assert got == truth
    assert truth  # non-vacuous


def test_bucketed_pairs_plan_has_no_nested_loop(spark):
    e = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 100)
    df = cosine_dedup_pairs(e, 0.45, n_bands=4, band_planes=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # the bucket equi-join is there


def test_vec_dim_derived_and_nonstandard_dims_work(spark):
    e = load(spark, SF_DIR, "embeddings")
    assert vec_dim(e) == len(e.first().embedding)
    # Truncate embeddings to 17 dims — lsh_topk must work without the
    # old hardcoded dim=64 (r2 nit).
    short = e.select("vec_id", F.slice("embedding", 1, 17).alias("embedding"))
    queries = short.filter(F.col("vec_id") < 3)
    cands = short.filter(F.col("vec_id") >= 3)
    out = lsh_topk(cands, queries, k=3, n_planes=3)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.rank <= 3 for r in rows)
    # Same-bucket pairs only — every returned cosine is a real cosine.
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)
