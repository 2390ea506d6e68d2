"""Repetition-filter and SimHash-near-dup operator tests."""

from pyspark.sql import functions as F

from deltacat_spark.operators.dedupe import simhash, simhash_near_dup
from deltacat_spark.operators.quality import repetition_stats


def test_repetition_stats_flags_degenerate_doc(spark):
    df = spark.createDataFrame(
        [
            # healthy: all words distinct
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            # keyword stuffing: one word dominates
            (2, "spam spam spam spam spam spam spam spam spam ham"),
            # 2-gram loop: "a b a b ..." — every word appears n/2 times
            (3, "a b a b a b a b a b"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_stats(df, "doc_id", "text").collect()
    }
    assert rows[1]["keep"] and rows[1]["top_word_frac"] == 0.1
    assert rows[1]["dup_word_frac"] == 0.0
    assert not rows[2]["keep"] and rows[2]["top_word_frac"] == 0.9
    # doc 3: top word a = 5/10, top 2-gram "a b" = 5/9
    assert not rows[3]["keep"]
    assert rows[3]["top_2gram_frac"] == round(5 / 9, 6)
    assert rows[3]["dup_word_frac"] == 0.8
    assert all(r["n_words"] == 10 for r in rows.values())


def test_repetition_stats_single_word_doc(spark):
    df = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    r = repetition_stats(df, "doc_id", "text").collect()[0]
    # one word, one degenerate 1-token "2-gram" — fully concentrated
    assert r["n_words"] == 1 and r["top_word_frac"] == 1.0
    assert not r["keep"]


import pytest


@pytest.mark.parametrize("bits", [32, 60])
def test_simhash_near_dup_matches_all_pairs(spark, bits):
    """Pigeonhole check: banded candidates + exact verify == brute-force
    all-pairs Hamming filter (bands=4 > max_hamming=3) — at both the
    32-bit library default and the 60-bit production width the
    `simhash_near_dup` workload query pins (r6)."""
    docs = spark.createDataFrame(
        [
            (i, f"term{i % 7} alpha beta gamma delta common words here "
                f"tail{i % 3}")
            for i in range(40)
        ],
        ["doc_id", "text"],
    )
    sims = simhash(docs, "doc_id", "text", bits=bits).localCheckpoint()
    banded = simhash_near_dup(sims, bits=bits, bands=4, max_hamming=3)
    a, b = sims.alias("a"), sims.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    assert sorted(map(tuple, banded.collect())) == sorted(
        map(tuple, brute.collect())
    )
    assert banded.count() > 0  # the corpus template guarantees near-dups


def test_simhash_near_dup_no_all_pairs_join(spark):
    """The physical plan must not contain a nested-loop (all-pairs)
    join — the candidate generator is a banded equi-join."""
    docs = spark.createDataFrame(
        [(i, f"w{i} x y z") for i in range(10)], ["doc_id", "text"]
    )
    plan = simhash_near_dup(
        simhash(docs, "doc_id", "text")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_near_dup_hot_bucket_star_cap(spark):
    """Buckets above `max_bucket` emit O(B) star pairs, not B²; capped
    equals uncapped when no bucket exceeds the cap."""
    from pyspark.sql import functions as F  # noqa: F811

    # 30 identical fingerprints (one hot bucket in every band) + 3 spread
    sims = spark.createDataFrame(
        [(i, 0xABCD1234) for i in range(30)]
        + [(100, 0x0F0F0F0F), (101, 0x0F0F0F0E), (102, 0x70F0F0F0)],
        ["doc_id", "simhash"],
    )
    uncapped = simhash_near_dup(sims, max_bucket=None)
    capped = simhash_near_dup(sims, max_bucket=8)
    n_un, n_cap = uncapped.count(), capped.count()
    # uncapped: C(30,2)=435 identical pairs + the (100,101) pair
    assert n_un == 435 + 1
    # capped: 29 star pairs for the hot bucket + the (100,101) pair
    assert n_cap == 29 + 1
    # every capped pair is a true pair (exact verify still applied)
    assert capped.join(uncapped, ["doc_a", "doc_b", "hamming"]).count() == n_cap
    # parity when no bucket is hot
    small = spark.createDataFrame(
        [(100, 0x0F0F0F0F), (101, 0x0F0F0F0E), (102, 0x70F0F0F0)],
        ["doc_id", "simhash"],
    )
    assert sorted(map(tuple, simhash_near_dup(small, max_bucket=8).collect())) == sorted(
        map(tuple, simhash_near_dup(small, max_bucket=None).collect())
    )


def test_containment_asymmetric_excerpt(spark):
    """A short doc fully contained in a long host: containment ≈ 1 in
    the short→host direction only; Jaccard stays below threshold."""
    from deltacat_spark.operators.dedupe import (
        containment_pairs,
        jaccard_pairs,
        shingle_sets,
    )

    host_words = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(10, 18))
    df = spark.createDataFrame(
        [(1, host_words), (2, excerpt), (3, "unrelated text entirely here")],
        ["doc_id", "text"],
    )
    sh = shingle_sets(df, "doc_id", "text", n=3)
    got = containment_pairs(sh, df_cap=None, threshold=0.9).collect()
    assert [(r.doc_id, r.host_id, r.containment) for r in got] == [(2, 1, 1.0)]
    # the same pair is invisible to Jaccard at any usable threshold
    assert not jaccard_pairs(sh, df_cap=None, threshold=0.3).collect()


def test_daily_anomalies_chebyshev_bound(spark):
    """No distribution can put more than 1/4 of its mass >= 2 sigma from
    the mean (Chebyshev) - this bound caught a cross-multiplication bug
    in the integer z-test, so it stays as a regression guard."""
    from deltacat_spark.workloads.profiling import events_daily_anomalies
    from deltacat_spark.workloads.base import load
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    n_days = (
        load(spark, sf, "events")
        .select(F.expr("ts_us div 86400000000").alias("d"))
        .distinct()
        .count()
    )
    n_anom = events_daily_anomalies(spark, sf).count()
    assert n_anom <= max(1, n_days // 4)
