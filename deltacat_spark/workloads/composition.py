"""Corpus-composition inventory: per-domain caps, mixture matrices, and
distribution-outlier detection — the "what is in this corpus" report
suite a training-data pipeline runs before and after every mixing
change. Beyond-the-reference surface (the reference dedupes and
compacts; composition analytics live above it), all expressed as
single-shuffle DataFrame aggregations with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.functions.text import token_count
from deltacat_spark.workloads.base import (
    cnt,
    cnt_sql,
    load,
    md5_prefix_int_sql,
)

_SOURCES = [f"src{i}" for i in range(20)]


# --- per-domain cap ---------------------------------------------------------
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ≤10-docs-per-source selection (`operators/
    sampling.py:domain_cap`): md5-ranked row_number within each source.
    One shuffle on source; see the operator docstring for the
    mega-domain pre-gate at 100 TB."""
    from deltacat_spark.operators.sampling import domain_cap

    d = load(spark, sf_dir, "documents")
    return (
        domain_cap(d, "source", "doc_id", cap=10)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


_CAP_H = md5_prefix_int_sql("CAST(doc_id AS VARCHAR)", 6)
DOMAIN_CAP_SQL = f"""
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY {_CAP_H}, doc_id) AS rn
  FROM documents) t
WHERE rn <= 10 ORDER BY source, doc_id
"""


# --- language × source mixture matrix ---------------------------------------
def lang_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc counts pivoted to one column per source, one row per lang —
    the corpus-mixture dashboard table. `pivot` with an EXPLICIT value
    list: Spark then skips the extra distinct-values job and the output
    schema is static (what a 100 TB report job needs — the values scan
    alone would be a full pass). Missing cells coalesce to 0."""
    d = load(spark, sf_dir, "documents")
    piv = (
        d.groupBy("lang")
        .pivot("source", _SOURCES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "lang",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(s) for s in _SOURCES],
    ).orderBy("lang")


_MATRIX_COLS = ",\n  ".join(
    f"CAST(SUM(CASE WHEN source = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS {s}"
    for s in _SOURCES
)
LANG_SOURCE_SQL = f"""
SELECT lang,
  {_MATRIX_COLS}
FROM documents GROUP BY lang ORDER BY lang
"""


# --- per-source length outliers ---------------------------------------------
def length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length z-scores with |z| > 2 flags (truncated /
    concatenated-document detection). Moment sums (n, Σx, Σx²) are EXACT
    integer aggregates — order-independent, so the derived mean/std/z
    doubles are bit-identical on any engine — computed in one map-side-
    combinable pass, broadcast back onto the corpus (stats rows ==
    distinct sources, tiny at any scale)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count(F.col("text")).alias("tok")
    )
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("tok").cast("long")).alias("s1"),
        F.sum((F.col("tok") * F.col("tok")).cast("long")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = F.round((F.col("tok") - mean) / F.sqrt(var), 4)
    return (
        d.join(F.broadcast(stats), "source")
        .select(
            "doc_id",
            "source",
            F.col("tok").alias("n_tokens"),
            z.alias("z"),
            (F.abs(z) > 2.0).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


LENGTH_OUTLIERS_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS INT) AS tok
  FROM documents),
stats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(tok) AS BIGINT) AS s1,
         CAST(SUM(tok * tok) AS BIGINT) AS s2
  FROM toks GROUP BY source)
SELECT doc_id, t.source, tok AS n_tokens,
  ROUND((tok - CAST(s1 AS DOUBLE) / n)
        / sqrt(CAST(s2 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)),
        4) AS z,
  abs(ROUND((tok - CAST(s1 AS DOUBLE) / n)
        / sqrt(CAST(s2 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)),
        4)) > 2.0 AS is_outlier
FROM toks t JOIN stats s ON t.source = s.source
ORDER BY doc_id
"""




def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic top-50 document sample
    (`operators/sampling.py:weighted_sample_topk`, Efraimidis–Spirakis
    A-ES with md5-derived uniforms), weighted by document length — the
    fixed-size training-subset draw that favors long documents without
    RNG state. See the operator docstring for the engine-exactness and
    no-shuffle scale argument."""
    from deltacat_spark.operators.sampling import weighted_sample_topk

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return weighted_sample_topk(d, "doc_id", "n_chars", k=50)


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       CAST(FLOOR(1000000.0
            * ln(({md5_prefix_int_sql("CAST(doc_id AS VARCHAR)")} + 1)
                 / CAST({16 ** 6} + 1 AS DOUBLE))
            / n_chars) AS BIGINT) AS score_micro
FROM documents
ORDER BY score_micro DESC, doc_id
LIMIT 50
"""


QUERIES = {
    "domain_cap_sample": (domain_cap_sample, DOMAIN_CAP_SQL),
    "lang_source_matrix": (lang_source_matrix, LANG_SOURCE_SQL),
    "length_outliers": (length_outliers, LENGTH_OUTLIERS_SQL),
    "weighted_sample_docs": (weighted_sample_docs, WEIGHTED_SAMPLE_SQL),
}
