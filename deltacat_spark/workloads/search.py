"""Full-text-search inventory: inverted index construction and BM25
ranking — the retrieval side of a training-data platform (dataset
search, decontamination probes, RAG corpus serving). Beyond-the-
reference surface expressed as plain aggregations; exact DuckDB oracles.

Determinism notes:
* Postings arrays are sorted and capped, so array cells hash
  identically on both engines.
* BM25 per-term scores are combined in a FIXED expression order
  (conditional-sum per query term, then left-to-right addition), not a
  float SUM whose partial order the engine picks — the one non-integer
  reduction in this module is therefore order-free. `ln` may differ by
  1 ulp across libm implementations; scores round to 4 decimals, which
  absorbs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.functions.text import token_count, tokens
from deltacat_spark.workloads.base import load

# Fixed query-term set (synthetic corpus vocabulary).
_Q_TERMS = ("hash", "join", "scan")
_K1 = 1.2
_B = 0.75
_POSTINGS_CAP = 100


# --- inverted index ---------------------------------------------------------
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → document-frequency + first-100 postings (sorted doc_ids).

    The document-frequency branch is a map-side-combinable count; the
    postings branch row_number-caps BEFORE `collect_list`, so no
    executor ever materializes a stop-term's full postings (collecting
    then slicing would buffer billions of doc_ids for a hot term at
    100 TB). The smallest-`cap` doc_ids sorted equal slice-of-full-sort,
    so the cheap form is also the exact one. A complete index would
    page postings as (term, doc_id div page_size) group keys — same
    plan, compound key. `postings` is emitted as a canonical
    comma-joined string (driver output contract: no array/struct/map
    columns in query results — see workloads/base.py)."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    pairs = d.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _POSTINGS_CAP)
        .groupBy("term")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("postings_arr"))
    )
    postings_str = F.array_join(
        F.transform(F.col("postings_arr"), lambda d_: d_.cast("string")), ","
    )
    return (
        dfreq.join(capped, "term")
        .select("term", "df", postings_str.alias("postings"))
        .orderBy("term")
    )


INVERTED_INDEX_SQL = f"""
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string((list_sort(list(doc_id)))[1:{_POSTINGS_CAP}], ',') AS postings
FROM (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
  FROM documents)
GROUP BY term ORDER BY term
"""


# --- BM25 ranking -----------------------------------------------------------
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 documents for the fixed query {hash, join, scan} under
    BM25 (k1=1.2, b=0.75). Term filter is pushed into the explode
    (map-side — only query-term occurrences ever shuffle); corpus stats
    (N, avg doc length) are one scalar row and the per-term df table has
    |query| rows, both broadcast. The same shape ranks a 100 TB corpus:
    nothing wide except the (doc, term) count."""
    d = load(spark, sf_dir, "documents")
    q = list(_Q_TERMS)
    occ = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isin(q))
    tf = occ.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    doclen = d.select("doc_id", token_count(F.col("text")).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("dl").cast("long")).alias("s_dl"),
    )

    avgdl = F.col("s_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = (F.col("tf") * F.lit(_K1 + 1)) / (
        F.col("tf") + F.lit(_K1) * (F.lit(1 - _B) + F.lit(_B) * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", (idf * norm).alias("s"))
    )
    # Fixed-order combination: one conditional sum per term, added
    # left-to-right — no engine-ordered float reduction.
    parts = [
        F.coalesce(F.sum(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0))
        for t in q
    ]
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return (
        scored.groupBy("doc_id")
        .agg(F.round(total, 4).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(15)
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in _Q_TERMS)
_PART_SQL = " + ".join(
    f"COALESCE(SUM(CASE WHEN term = '{t}' THEN s END), 0.0)" for t in _Q_TERMS
)
BM25_SQL = f"""
WITH occ AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term IN ({_TERMS_SQL})),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM occ GROUP BY doc_id, term),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
doclen AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS s_dl
  FROM doclen),
scored AS (
  SELECT t.doc_id, t.term,
    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    * (tf * {_K1 + 1}) / (tf + {_K1} * ({1 - _B} + {_B} * dl
        / (CAST(s_dl AS DOUBLE) / n_docs))) AS s
  FROM tf t JOIN dfreq USING (term) JOIN doclen USING (doc_id), stats)
SELECT doc_id, ROUND({_PART_SQL}, 4) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 15
"""


QUERIES = {
    "inverted_index": (inverted_index, INVERTED_INDEX_SQL),
    "bm25_search": (bm25_search, BM25_SQL),
}
