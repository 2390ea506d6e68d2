"""Corpus sampling / sequence packing operators: determinism, rate
behavior, and the no-shuffle plan shape."""

from pyspark.sql import functions as F

from deltacat_spark.operators.sampling import pack_sequences, stratified_sample
from deltacat_spark.workloads.base import load

SF_DIR = "/root/testdata/sf0.01"


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    d = load(spark, SF_DIR, "documents")
    rates = {"en": 0.5, "de": 1.0, "zh": 0.25}
    a = {r.doc_id for r in stratified_sample(d, "lang", "doc_id", rates).collect()}
    b = {r.doc_id for r in stratified_sample(d, "lang", "doc_id", rates).collect()}
    assert a == b and a  # byte-identical re-runs, non-vacuous
    by_lang = (
        stratified_sample(d, "lang", "doc_id", rates)
        .groupBy("lang")
        .count()
        .collect()
    )
    got = {r.lang: r["count"] for r in by_lang}
    totals = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
    assert set(got) <= {"en", "de", "zh"}  # unlisted strata dropped
    assert got["de"] == totals["de"]  # rate 1.0 keeps everything
    assert 0 < got["en"] < totals["en"]  # rate 0.5 strictly downsamples


def test_stratified_sample_plan_has_no_corpus_shuffle(spark):
    d = load(spark, SF_DIR, "documents")
    df = stratified_sample(d, "lang", "doc_id", {"en": 0.5})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # corpus never shuffles


def test_pack_sequences_windows_are_contiguous_per_shard(spark):
    d = load(spark, SF_DIR, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    out = pack_sequences(
        d, "doc_id", "n_tokens", max_tokens=2048, partition_col="lang"
    ).collect()
    by_lang: dict = {}
    for r in sorted(out, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        assert rows[0].seq_id == 0  # first doc starts window 0
        # seq ids are non-decreasing in doc order and match the running sum
        cum = 0
        for r in rows:
            assert r.seq_id == cum // 2048
            cum += r.n_tokens


def test_split_assign_disjoint_exhaustive_deterministic(spark):
    from deltacat_spark.operators.sampling import split_assign

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # exhaustive, disjoint
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] - 1600) < 200  # md5 gate ≈ uniform
    # determinism: same ids → identical assignment on re-run
    again = {r.doc_id: r.split for r in split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r.doc_id: r.split for r in out.collect()}
    assert first == again


def test_domain_cap_limits_and_determinism(spark):
    from deltacat_spark.operators.sampling import domain_cap

    # 3 domains with 100/30/5 docs
    df = spark.range(135).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "big")
        .when(F.col("id") < 130, "mid")
        .otherwise("tiny")
        .alias("source"),
    )
    out = domain_cap(df, "source", "doc_id", cap=10)
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # capped at 10; under-cap domains keep everything
    assert counts == {"big": 10, "mid": 10, "tiny": 5}
    # deterministic winners on re-run
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in domain_cap(df, "source", "doc_id", cap=10).collect())
    assert a == b
    # kept rows are a subset of the input rows (no mutation)
    assert set(a) <= set(range(135))
