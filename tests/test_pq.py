"""PQ codes + shortlist-rerank ANN (`workloads/similarity2.py`):
analytic guards the oracle comparison can't provide — the oracle would
agree with a wrong-but-mirrored formula."""

from pyspark.sql import functions as F

from deltacat_spark.workloads.base import load
from deltacat_spark.workloads.similarity2 import (
    _SHORTLIST,
    _XQ,
    ann_pq_topk,
    embedding_pq_codes,
)

SF = "/root/testdata/sf0.01"


def _exact_topk(spark, k):
    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.expr(_XQ).alias("qx"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.expr(
                f"aggregate(zip_with({_XQ}, qx, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dist"),
        )
        .orderBy("dist", "vec_id")
        .limit(k)
    )


def test_codes_shape_and_range(spark):
    rows = embedding_pq_codes(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:50]:
        parts = r.codes.split(",")
        assert len(parts) == 8  # M codes per vector
        assert all(0 <= int(p) < 16 for p in parts)  # K-bounded


def test_rerank_distances_are_exact(spark):
    """The reranked output's distances must EQUAL the exact integer L2
    for those ids — rerank touches raw vectors, not codes."""
    got = {r.vec_id: r.dist for r in ann_pq_topk(spark, SF).collect()}
    exact_all = {
        r.vec_id: r.dist for r in _exact_topk(spark, 499).collect()
    }
    for vid, d in got.items():
        assert exact_all[vid] == d


def test_shortlist_recall_beats_random(spark):
    """Recall@10 of the PQ-shortlisted rerank vs exact search. A random
    64-of-499 shortlist catches 10·(64/499) ≈ 1.3 of the true top-10 in
    expectation; the PQ shortlist must do substantially better (measured
    0.6 on this near-uniform synthetic corpus — real clustered
    embeddings separate far more)."""
    exact_ids = {r.vec_id for r in _exact_topk(spark, 10).collect()}
    pq_ids = {r.vec_id for r in ann_pq_topk(spark, SF).collect()}
    recall = len(exact_ids & pq_ids) / 10
    random_expectation = _SHORTLIST / 499
    assert recall >= 0.4, f"recall {recall}"
    assert recall > 2 * random_expectation
