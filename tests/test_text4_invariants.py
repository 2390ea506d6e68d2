"""Analytic invariants for the round-7 curation operators — guards
against the both-engines-agree-on-a-wrong-formula failure mode the
oracle comparison cannot catch."""

from pyspark.sql import functions as F

from deltacat_spark.workloads.text4 import dsir_importance, gopher_quality_rules

SF = "/root/testdata/sf0.001"


def test_gopher_rules_consistent(spark):
    out = gopher_quality_rules(spark, SF).collect()
    assert out, "empty corpus"
    for r in out:
        # the conjunction IS the conjunction
        assert r.gopher_pass == (
            r.r_word_count and r.r_mean_word_len and r.r_stopwords
        )
        # permille metrics live in sane ranges
        assert 0 <= r.stop_permille <= 1000
        assert r.mwl_permille >= 1000  # words are ≥1 char
        # rule ↔ metric agreement
        assert r.r_word_count == (30 <= r.n_words <= 100_000)
        assert r.r_mean_word_len == (3000 <= r.mwl_permille <= 10_000)
    passes = sum(1 for r in out if r.gopher_pass)
    assert 0 < passes < len(out), "degenerate rule set (all pass or all fail)"


def test_dsir_targets_score_higher(spark):
    """The defining DSIR property: documents FROM the target domain
    must average a higher per-token importance than the rest — the
    ratio ln(p_target/p_raw) is literally trained on them."""
    scores = dsir_importance(spark, SF)
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    per_tok = scores.join(d, "doc_id").select(
        (F.col("lang") == "en").alias("is_en"),
        (F.col("dsir_micro") / F.col("n_tokens")).alias("s"),
    )
    rows = {r.is_en: r.avg for r in per_tok.groupBy("is_en").agg(F.avg("s").alias("avg")).collect()}
    assert rows[True] > rows[False], rows


def test_dsir_score_is_token_additive(spark, tmp_path):
    """A document whose text is another document's text repeated twice
    must score EXACTLY 2x its dsir_micro: the ratio table is global, so
    the per-doc reduction is a pure integer dot product — any per-doc
    normalization or float drift breaks the equality."""
    rows = [
        (1, "alpha beta gamma delta", "en", "s", 22),
        (2, "alpha beta gamma delta alpha beta gamma delta", "zh", "s", 45),
        (3, "epsilon zeta eta theta iota", "en", "s", 27),
        (4, "kappa lambda mu", "de", "s", 15),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_tokens, r.dsir_micro)
        for r in dsir_importance(spark, str(tmp_path)).collect()
    }
    assert got[2][0] == 2 * got[1][0]
    assert got[2][1] == 2 * got[1][1]
