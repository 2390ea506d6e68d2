"""Survivor selection (`operators.dedupe.keep_best`): quality keep
rule, deterministic tie-break, singleton passthrough."""

from deltacat_spark.operators.dedupe import keep_best


def test_keep_best_quality_and_ties(spark):
    docs = spark.createDataFrame(
        [
            (1, 10.0),  # cluster A: 2 wins on quality
            (2, 50.0),
            (3, 50.0),  # tie with 2 → min id (2) wins
            (7, 5.0),   # cluster B: tie everywhere → min id 7
            (8, 5.0),
            (9, 1.0),   # unclustered — always survives
        ],
        "doc_id long, q double",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "doc_id long, cluster_id long"
    )
    kept = sorted(r.doc_id for r in keep_best(docs, labels, "doc_id", "q").collect())
    assert kept == [2, 7, 9]


def test_keep_best_no_quality_min_id(spark):
    docs = spark.createDataFrame([(5,), (6,), (11,)], "doc_id long")
    labels = spark.createDataFrame(
        [(5, 5), (6, 5)], "doc_id long, cluster_id long"
    )
    kept = sorted(r.doc_id for r in keep_best(docs, labels).collect())
    assert kept == [5, 11]
