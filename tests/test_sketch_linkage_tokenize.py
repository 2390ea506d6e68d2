"""Round-8 third batch: count-min sketch invariants (+ streaming
registers), log-histogram quantile sketch vs exact quantiles,
entity-resolution fuzzy match vs a pure-Python reference, and BPE
corpus encoding vs a pure-Python reference.

These are the analytic sanity bounds the oracle gate cannot provide
(an oracle agrees with a wrong formula if both engines share it)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_cms_never_underestimates_and_rows_conserve(spark):
    from deltacat_spark.workloads.sketch import _CMS_D, cms_heavy_hitters, cms_prep
    from deltacat_spark.workloads.base import load

    rows = cms_heavy_hitters(spark, SF).collect()
    assert rows, "expected heavy-hitter rows"
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r

    # Each hash row of the sketch conserves the record count: the w
    # columns of one row partition the corpus.
    li = load(spark, SF, "lineitem").select("l_partkey")
    n = li.count()
    per_row = (
        cms_prep(li, "l_partkey")
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(per_row) == _CMS_D
    assert all(r["n"] == n for r in per_row)


def test_streaming_cms_registers_match_batch(spark, tmp_path):
    """CMS registers are a (row, col)-keyed SUM, so a structured stream
    maintains them with plain aggregate state and equals the batch
    sketch over the same union of chunks."""
    from deltacat_spark.workloads.sketch import cms_prep

    src = str(tmp_path / "src")
    a = spark.createDataFrame([(i % 40,) for i in range(300)], "k long")
    b = spark.createDataFrame([(i % 25,) for i in range(300)], "k long")
    a.write.parquet(src)
    b.write.mode("append").parquet(src)

    def regs(df):
        return cms_prep(df, "k").groupBy("r", "c").agg(
            F.count(F.lit(1)).alias("n")
        )

    batch = {
        (r["r"], r["c"], r["n"])
        for r in regs(spark.read.parquet(src)).collect()
    }
    stream = (
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        regs(stream)
        .writeStream.format("memory")
        .queryName("cms_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["r"], r["c"], r["n"])
        for r in spark.sql("SELECT * FROM cms_regs").collect()
    }
    assert streamed == batch


def test_streaming_quantile_registers_match_batch(spark, tmp_path):
    """Log-histogram quantile registers are (grp,bucket)-keyed COUNTs —
    a structured stream maintains them with plain aggregate state and
    equals the batch registers over the union of chunks."""
    src = str(tmp_path / "src")
    a = spark.createDataFrame(
        [(i % 3, 1 + i * 7) for i in range(200)], "g int, v long"
    )
    b = spark.createDataFrame(
        [(i % 2, 1 + i * 13) for i in range(200)], "g int, v long"
    )
    a.write.parquet(src)
    b.write.mode("append").parquet(src)

    def regs(df):
        return (
            df.select(
                "g", F.length(F.bin(F.col("v"))).cast("int").alias("bucket")
            )
            .groupBy("g", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    batch = {
        (r["g"], r["bucket"], r["n"])
        for r in regs(spark.read.parquet(src)).collect()
    }
    stream = (
        spark.readStream.schema("g int, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        regs(stream)
        .writeStream.format("memory")
        .queryName("q_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["g"], r["bucket"], r["n"])
        for r in spark.sql("SELECT * FROM q_regs").collect()
    }
    assert streamed == batch


def test_quantile_sketch_brackets_exact_quantiles(spark):
    """For every (grp, p) the sketch's bucket must be the bucket of the
    EXACT p-quantile (same cum >= p*tot/1000 definition), so the true
    quantile lies in [lo, hi]."""
    from deltacat_spark.workloads.sketch import quantile_sketch_prices
    from deltacat_spark.workloads.base import load

    got = {
        (r["grp"], r["p"]): (r["bucket"], r["lo"], r["hi"])
        for r in quantile_sketch_prices(spark, SF).collect()
    }
    assert got, "no sketch rows"

    vals = [
        (r["o_orderpriority"], int(r["o_totalprice"]))
        for r in load(spark, SF, "orders")
        .select("o_orderpriority", F.floor("o_totalprice").alias("o_totalprice"))
        .collect()
    ]
    by_grp: dict[str, list[int]] = {}
    for g, v in vals:
        by_grp.setdefault(g, []).append(v)
        by_grp.setdefault("ALL", []).append(v)
    for (g, p), (bucket, lo, hi) in got.items():
        xs = sorted(by_grp[g])
        # smallest value whose rank satisfies rank*1000 >= p*n
        idx = next(
            i for i in range(len(xs)) if (i + 1) * 1000 >= p * len(xs)
        )
        true_q = xs[idx]
        assert bucket == true_q.bit_length(), (g, p, true_q, bucket)
        assert lo <= true_q <= hi


def test_er_fuzzy_match_equals_reference(spark):
    """Exact set equality with a pure-Python blocking + edit-distance
    reference over the distinct part names."""
    from deltacat_spark.workloads.linkage import _MAX_DIST, er_fuzzy_match_parts
    from deltacat_spark.workloads.base import load

    names = {}
    for r in (
        load(spark, SF, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        names[r["p_name"]] = r["n"]
    want = set()
    for a in names:
        for b in names:
            if a < b and a.split(" ")[1] == b.split(" ")[1]:
                d = _levenshtein(a, b)
                if d <= _MAX_DIST:
                    want.add((a, b, d, names[a], names[b]))
    got = {
        (r["name_a"], r["name_b"], r["dist"], r["support_a"], r["support_b"])
        for r in er_fuzzy_match_parts(spark, SF).collect()
    }
    assert got == want
    assert want, "expected at least one fuzzy pair"


def test_bpe_encode_matches_reference(spark):
    """Per-doc token counts under the learned merges equal a pure-Python
    learn + greedy-apply over the same corpus."""
    from deltacat_spark.operators.bpe import learn_bpe_merges_local
    from deltacat_spark.workloads.base import load
    from deltacat_spark.workloads.tokenize import _N_MERGES, bpe_encode_tokens

    docs = [
        (r["doc_id"], r["text"])
        for r in load(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    wc: dict[str, int] = {}
    for _, t in docs:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    merges = [(a, b) for a, b, _ in learn_bpe_merges_local(wc, _N_MERGES)]

    def encode_len(word: str) -> int:
        syms = list(word)
        for a, b in merges:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return len(syms)

    tok_len = {w: encode_len(w) for w in wc}
    want = {
        doc_id: sum(tok_len[w] for w in t.split(" ") if w)
        for doc_id, t in docs
    }
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode_tokens(spark, SF).collect()
    }
    assert got == want
