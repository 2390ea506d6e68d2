"""Corpus-quality repetition signals (Gopher/RefinedWeb-style filters).

Beyond-the-reference training-data surface (the reference dedupes only
on primary keys — `compactor_v2/utils/dedupe.py`): repetition-heavy
documents (boilerplate, keyword stuffing, degenerate generations) are
flagged by the fraction of token mass concentrated in the most-repeated
unit — the word/n-gram repetition rules of published corpus-curation
pipelines. Everything is a key-partitioned aggregate with map-side
combine; no per-row Python, no all-pairs joins, so the plan is the same
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from deltacat_spark.functions.text import tokens, word_ngrams


def _unit_stats(units: DataFrame, prefix: str, distinct_count: bool) -> DataFrame:
    """(doc_id, {prefix}_top_n, {prefix}_n[, {prefix}_distinct]) from a
    (doc_id, u) occurrence stream: two stacked aggregates, both with
    map-side partials — the (doc_id, u) shuffle is the only wide one."""
    per = units.groupBy("doc_id", "u").agg(F.count(F.lit(1)).alias("c"))
    aggs = [
        F.max("c").alias(f"{prefix}_top_n"),
        F.sum("c").alias(f"{prefix}_n"),
    ]
    if distinct_count:
        aggs.append(F.count(F.lit(1)).alias(f"{prefix}_distinct"))
    return per.groupBy("doc_id").agg(*aggs)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_word_max: float = 0.2,
    top_2gram_max: float = 0.2,
) -> DataFrame:
    """Per-document repetition signals + keep flag.

    Returns (doc_id, n_words, top_word_frac, dup_word_frac,
    top_2gram_frac, keep):

    * top_word_frac — occurrences of the most frequent word / total
      words (Gopher's "fraction of characters in the most common
      n-gram" family, word-unit form).
    * dup_word_frac — 1 − distinct words / total words (vocabulary
      collapse signal).
    * top_2gram_frac — same concentration measure over word 2-grams
      WITH multiplicity (`word_ngrams`, not the distinct shingle set).
    * keep — both concentration fractions at or below their thresholds.

    The keep decision compares the ROUNDED fractions so any engine
    computing the same rounded values makes the same decision.
    """
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("u"),
    )
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), 2)).alias("u"),
    )
    ws = _unit_stats(words, "w", distinct_count=True)
    gs = _unit_stats(grams, "g", distinct_count=False)
    top_word = F.round(F.col("w_top_n") / F.col("w_n"), 6)
    dup_word = F.round(F.lit(1) - F.col("w_distinct") / F.col("w_n"), 6)
    top_2gram = F.round(F.col("g_top_n") / F.col("g_n"), 6)
    return (
        ws.join(gs, "doc_id")
        .select(
            "doc_id",
            F.col("w_n").alias("n_words"),
            top_word.alias("top_word_frac"),
            dup_word.alias("dup_word_frac"),
            top_2gram.alias("top_2gram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("top_word_frac") <= top_word_max)
            & (F.col("top_2gram_frac") <= top_2gram_max),
        )
    )
