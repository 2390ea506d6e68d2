"""Text-analysis column functions: tokenization, shingling, quality,
fingerprinting.

All expressions are Spark built-ins (higher-order array functions, md5)
— no Python UDFs — so they run inside whole-stage codegen and scale
linearly with executors. Each has an exact DuckDB-SQL twin in
`deltacat_spark.workloads.text` for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokens (simple split — the document corpus is
    single-space separated; use split on literal space for engine parity)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """All word n-grams WITH multiplicity (repetition counting needs
    occurrences; `word_shingles` is the distinct-set variant).

    Array of `concat_ws(' ', t[i..i+n-1])` for i in 1..len-n+1 (1-based),
    built with sequence+transform so it stays vectorized.

    The token array is BOUND ONCE as a lambda variable (the outer
    single-element `transform`): Spark does not common-subexpression-
    eliminate inside higher-order-function lambdas, so referencing the
    `split` expression directly from the inner lambda re-evaluates it on
    every element access — O(words²) per document (measured 6× slower
    at sf0.1 on the shingle explode).
    """

    def _ngrams(t: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.lit(1), F.size(t) - F.lit(n - 1))
        )
        # F.get (0-based) is null-safe out of bounds — element_at raises
        # under ANSI mode (Spark 4 default); concat_ws then skips the
        # trailing nulls, matching DuckDB's t[i] out-of-range semantics.
        parts = lambda i: [F.get(t, i + j - 1) for j in range(n)]  # noqa: E731
        return F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))

    return F.get(F.transform(F.array(tokens(text)), _ngrams), 0)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, the MinHash/Jaccard unit."""
    return F.array_distinct(word_ngrams(text, n))


def char_shingles(text: Column, width: int = 8, stride: int = 4) -> Column:
    """Character shingles (winnowing-style fingerprint unit)."""
    idx = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.length(text) - F.lit(width - 1)),
        F.lit(stride),
    )
    return F.transform(idx, lambda i: F.md5(F.substring(text, i, width)))


def doc_fingerprint(text: Column, width: int = 8, stride: int = 4) -> Column:
    """Deterministic document fingerprint: min md5 over char shingles
    (a 1-permutation MinHash — robust to small edits)."""
    return F.array_min(char_shingles(text, width, stride))


def quality_score(text: Column, stopwords: tuple[str, ...] = ("the", "a")) -> Column:
    """Heuristic quality score in [0,1]: length, token length, stopword mix.

    Mirrors classic pretraining-corpus filters (length/stopword-ratio
    gates). Pure double arithmetic in a fixed expression tree so Spark
    and DuckDB produce identical bits.
    """
    t = tokens(text)
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    avg_tok_len = (F.length(F.replace(text, F.lit(" "), F.lit(""))) / n_tok).cast(
        "double"
    )
    stop_ratio = (n_stop / n_tok).cast("double")
    return F.round(
        F.lit(0.5) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.2) * F.least(F.lit(1.0), avg_tok_len / F.lit(5.0)),
        6,
    )


# -- PII / pattern scrubbing --------------------------------------------------
# ASCII-only regexes chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB) so scrub output is engine-reproducible.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ ]+"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """Redact URLs, then emails, then IPv4 addresses (order matters:
    URLs may contain '@' or dotted quads; after <URL> replacement the
    remaining text is scanned for bare emails/IPs). Pure
    `regexp_replace` — JVM-side, streaming-safe, no UDF."""
    out = F.regexp_replace(text, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def pii_counts(text: Column) -> "tuple[Column, Column, Column]":
    """(n_urls, n_emails, n_ips) found in the raw text."""
    return (
        F.regexp_count(text, F.lit(URL_RE)),
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(IPV4_RE)),
    )
