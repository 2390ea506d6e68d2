"""Round-8 second batch: iterative BPE trainer vs a pure-Python
reference, A-ES weighted sampling bias, and streaming HLL registers
(incremental + merge-equal to the batch sketch)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bpe_merges_match_reference(spark):
    """The distributed merge-learn loop must produce exactly the
    reference implementation's merge sequence (same tie-breaks) on the
    real corpus."""
    from deltacat_spark.operators.bpe import (
        learn_bpe_merges,
        learn_bpe_merges_local,
    )
    from deltacat_spark.workloads.base import load

    d = load(spark, SF, "documents")
    got = learn_bpe_merges(d, "text", n_merges=8)

    wc = {
        r["w"]: r["c"]
        for r in d.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    want = learn_bpe_merges_local(wc, n_merges=8)
    assert got == want
    # merges actually merge: counts are non-increasing is NOT guaranteed
    # for BPE, but every learned pair must have been frequent (> 1).
    assert all(n > 1 for _, _, n in got)
    # later merges can reference earlier merged symbols (multi-char)
    assert any(len(a) > 1 or len(b) > 1 for a, b, _ in got)


def test_bpe_fold_is_left_to_right(spark):
    """'aaa' under merge (a,a) → [aa, a], the standard greedy
    application — guards the fold's non-overlapping semantics."""
    from deltacat_spark.operators.bpe import learn_bpe_merges

    df = spark.createDataFrame([("aaa aaa aaa ab",)], "text string")
    merges = learn_bpe_merges(df, "text", n_merges=2)
    # pair (a,a) appears 2x per 'aaa' word (positions 0-1, 1-2) → n=6
    assert merges[0][:2] == ("a", "a")
    assert merges[0][2] == 6
    # after merging, each 'aaa' is [aa, a] → next pair is (aa, a) with 3
    assert merges[1][:2] == ("aa", "a")
    assert merges[1][2] == 3


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """A-ES with weight = n_chars must overselect long documents: the
    sampled mean length exceeds the corpus mean."""
    from deltacat_spark.workloads.base import load
    from deltacat_spark.operators.sampling import weighted_sample_topk

    d = load(spark, SF, "documents").select("doc_id", "n_chars")
    top = weighted_sample_topk(d, "doc_id", "n_chars", k=50).collect()
    assert len(top) == 50
    corpus_mean = d.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r["n_chars"] for r in top) / 50
    assert sample_mean > corpus_mean
    # deterministic: a second run selects the identical set
    again = weighted_sample_topk(d, "doc_id", "n_chars", k=50).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in top}


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """HLL registers built by an incremental streaming aggregation over
    two file chunks equal the batch registers over the union — the
    sketch's merge property carries to structured streaming with plain
    max-aggregate state."""
    from deltacat_spark.workloads.sketch import hll_prep

    src = str(tmp_path / "src")
    a = spark.createDataFrame([(i,) for i in range(0, 300)], "user_id long")
    b = spark.createDataFrame(
        [(i,) for i in range(200, 500)], "user_id long"
    )
    a.write.parquet(src)
    b.write.mode("append").parquet(src)

    batch = {
        (r["bucket"], r["max_rho"])
        for r in hll_prep(spark.read.parquet(src), "user_id")
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
        .collect()
    }

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    regs = (
        hll_prep(stream, "user_id")
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["bucket"], r["max_rho"])
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    assert streamed == batch
