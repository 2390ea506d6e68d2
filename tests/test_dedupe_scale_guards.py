"""Scale guards in the dedup operators: hot-bucket star capping and
duplicate-cluster connected components."""

from pyspark.sql import functions as F

from deltacat_spark.operators.dedupe import (
    connected_components,
    lsh_candidates,
    minhash_signatures,
    shingle_sets,
)


def _identical_docs(spark, n):
    text = "the same boilerplate sentence repeated across many documents"
    return spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )


def test_hot_bucket_star_cap_bounds_candidates(spark):
    n = 1000
    docs = _identical_docs(spark, n)
    sh = shingle_sets(docs, "doc_id", "text", n=3)
    sigs = minhash_signatures(sh, num_perms=8)
    capped = lsh_candidates(sigs, rows_per_band=2, max_bucket=50)
    got = capped.count()
    # Identical docs land in ONE bucket per band: uncapped would emit
    # n*(n-1)/2 ≈ 500k pairs; the star cap emits n-1 per hot bucket.
    assert got == n - 1
    # Connectivity is preserved: every doc still reaches doc 0.
    cc = connected_components(capped)
    assert cc.count() == n
    assert cc.agg(F.countDistinct("cluster_id")).collect()[0][0] == 1


def test_star_cap_parity_below_threshold(spark):
    # Small buckets (≤ max_bucket) are bit-for-bit the uncapped result.
    docs = _identical_docs(spark, 10)
    sh = shingle_sets(docs, "doc_id", "text", n=3)
    sigs = minhash_signatures(sh, num_perms=8)
    uncapped = {
        tuple(r) for r in lsh_candidates(sigs, max_bucket=None).collect()
    }
    capped = {
        tuple(r) for r in lsh_candidates(sigs, max_bucket=50).collect()
    }
    assert capped == uncapped and len(capped) == 45


def test_defaults_are_scale_guarded_and_parity_on_real_corpus(spark):
    """Library defaults (max_bucket=64, df_cap=50) must agree with the
    uncapped form on the sf0.01 documents corpus (no hot buckets there),
    so safe-by-default costs nothing in fidelity."""
    from deltacat_spark.operators.dedupe import jaccard_pairs
    from deltacat_spark.workloads.base import load

    d = load(spark, "/root/testdata/sf0.01", "documents")
    sh = shingle_sets(d, "doc_id", "text", n=3)
    sigs = minhash_signatures(sh, num_perms=8)
    capped_c = lsh_candidates(sigs, rows_per_band=2)  # default cap
    uncapped_c = lsh_candidates(sigs, rows_per_band=2, max_bucket=None)
    assert {tuple(r) for r in capped_c.collect()} == {
        tuple(r) for r in uncapped_c.collect()
    }
    capped = jaccard_pairs(sh, candidates=capped_c)  # default df_cap
    uncapped = jaccard_pairs(sh, candidates=uncapped_c, df_cap=None)
    got_c = {tuple(r) for r in capped.collect()}
    got_u = {tuple(r) for r in uncapped.collect()}
    assert got_c == got_u
    assert got_c  # non-vacuous


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4, island pair 10-11, singleton edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)],
        "doc_a long, doc_b long",
    )
    cc = connected_components(pairs)
    got = {(r.doc_id, r.cluster_id) for r in cc.collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20),
    }


def test_incremental_dedupe_never_pairs_within_a_side(spark):
    from deltacat_spark.operators.dedupe import jaccard_pairs_across
    from deltacat_spark.workloads.base import load

    d = load(spark, "/root/testdata/sf0.01", "documents")
    sh_c = shingle_sets(d.filter(F.col("doc_id") < 250), "doc_id", "text")
    sh_n = shingle_sets(d.filter(F.col("doc_id") >= 250), "doc_id", "text")
    out = jaccard_pairs_across(sh_c, sh_n, df_cap=None, threshold=0.7).collect()
    assert out  # non-vacuous (13 cross-split pairs at sf0.01)
    assert all(r.doc_id >= 250 and r.dup_of < 250 for r in out)


def test_contamination_probe_side_broadcasts(spark):
    from deltacat_spark.operators.dedupe import contamination_overlap
    from deltacat_spark.workloads.base import load

    d = load(spark, "/root/testdata/sf0.01", "documents")
    sh_docs = shingle_sets(d.filter(F.col("doc_id") >= 50), "doc_id", "text")
    sh_probes = shingle_sets(d.filter(F.col("doc_id") < 50), "doc_id", "text")
    df = contamination_overlap(sh_docs, sh_probes, min_shared=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles
    rows = df.collect()
    assert rows and all(r.n_shared >= 3 for r in rows)
