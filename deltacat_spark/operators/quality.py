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

from deltacat_spark.functions.text import tokens


def _tagged_units(t, n: int = 2):
    """All repetition units of a BOUND token array `t` as one tagged
    stream: every word as ('w', word) plus every word n-gram WITH
    multiplicity as ('g', gram) — the same gram construction as
    `functions.text.word_ngrams` (1-based sequence, null-safe `get`,
    `concat_ws` skipping trailing nulls, so a doc shorter than n yields
    one truncated gram). Emitting both unit kinds from one array means
    one tokenize, one scan, and one (doc_id, kind, unit) shuffle instead
    of two tokenize+shuffle branches joined back per doc (the round-3
    plan)."""
    words = F.transform(
        t, lambda w: F.struct(F.lit("w").alias("k"), w.alias("u"))
    )
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(t) - F.lit(n - 1)))
    grams = F.transform(
        idx,
        lambda i: F.struct(
            F.lit("g").alias("k"),
            F.concat_ws(" ", *[F.get(t, i + j - 1) for j in range(n)]).alias("u"),
        ),
    )
    return F.concat(words, grams)


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
    # Bind the token array ONCE as a lambda variable (outer single-element
    # transform) — Spark does not CSE inside higher-order-function lambdas,
    # so indexing the raw split() from the gram lambda would re-split the
    # text per element access (see `word_ngrams` docstring).
    # (single-arg lambda: F.transform would otherwise bind the element
    # index to _tagged_units' second parameter)
    units_arr = F.get(
        F.transform(F.array(tokens(F.col(text_col))), lambda t: _tagged_units(t)), 0
    )
    units = df.select(
        F.col(id_col).alias("doc_id"), F.explode(units_arr).alias("x")
    ).select("doc_id", "x.k", "x.u")
    per = units.groupBy("doc_id", "k", "u").agg(F.count(F.lit(1)).alias("c"))
    w = F.col("k") == "w"
    g = F.col("k") == "g"
    stats = per.groupBy("doc_id").agg(
        F.max(F.when(w, F.col("c"))).alias("w_top_n"),
        F.sum(F.when(w, F.col("c"))).alias("w_n"),
        F.count(F.when(w, F.lit(1))).alias("w_distinct"),
        F.max(F.when(g, F.col("c"))).alias("g_top_n"),
        F.sum(F.when(g, F.col("c"))).alias("g_n"),
    )
    top_word = F.round(F.col("w_top_n") / F.col("w_n"), 6)
    dup_word = F.round(F.lit(1) - F.col("w_distinct") / F.col("w_n"), 6)
    top_2gram = F.round(F.col("g_top_n") / F.col("g_n"), 6)
    return (
        # Both unit kinds exist for every doc (an empty/1-token doc still
        # yields one word and one truncated gram); the filter mirrors the
        # previous two-branch inner join's drop semantics exactly.
        stats.filter(F.col("w_n").isNotNull() & F.col("g_n").isNotNull())
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
