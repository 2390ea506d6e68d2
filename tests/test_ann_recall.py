"""ANN recall: IVF (data-adaptive cells) must match or beat sign-LSH
multiprobe (data-oblivious hyperplanes) against the brute-force truth."""

from pyspark.sql import functions as F

from deltacat_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from deltacat_spark.workloads.base import load

SF_DIR = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r.q_id, r.cand_id) for r in df.select("q_id", "cand_id").collect()}


def test_ivf_recall_at_least_lsh_multiprobe(spark):
    e = load(spark, SF_DIR, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    candidates = e.filter(F.col("vec_id") >= 10)
    truth = _pairs(brute_force_topk(candidates, queries, k=5))
    lsh = _pairs(
        lsh_topk(candidates, queries, k=5, n_planes=4, multiprobe=True)
    )
    ivf = _pairs(
        ivf_topk(candidates, queries, k=5, n_centroids=8, nprobe=3, iters=2)
    )
    lsh_recall = len(lsh & truth) / len(truth)
    ivf_recall = len(ivf & truth) / len(truth)
    assert ivf_recall >= lsh_recall
    assert ivf_recall >= 0.6  # measured 0.74 (probing 3/8 cells)


def test_ivf_centroids_deterministic(spark):
    e = load(spark, SF_DIR, "embeddings")
    candidates = e.filter(F.col("vec_id") >= 10)
    from deltacat_spark.operators.similarity import ivf_centroids

    a = ivf_centroids(candidates, n_centroids=4, iters=1).collect()
    b = ivf_centroids(candidates, n_centroids=4, iters=1).collect()
    assert sorted((r.cid, tuple(r.c_vec)) for r in a) == sorted(
        (r.cid, tuple(r.c_vec)) for r in b
    )
