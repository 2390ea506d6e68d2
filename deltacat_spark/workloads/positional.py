"""Positional (substring-level) duplicate detection — the Lee et al.
"Deduplicating Training Data Makes Language Models Better" shape:
find maximal cross-document REPEATED TOKEN RUNS, not just duplicate
documents. Doc-level dedup misses a 90-token boilerplate block pasted
into otherwise-distinct pages; this operator returns the block's exact
coordinates in both documents.

Plan (all array-native, no self-join of corpora):
1. per-doc token 8-gram POSITION index, built in-row from the word
   array (`transform(sequence)` slice hash — nothing window-shaped);
2. gram document-frequency prefilter: only grams seen in 2..`_DF_CAP`
   documents join (the ≥2 side is the whole point — unique grams are
   the overwhelming majority and never enter the pairwise stage; the
   cap is the stop-gram discipline every positional-dedup pipeline
   needs, since a boilerplate gram in 10⁶ docs would otherwise emit
   10¹² position pairs);
3. equi-join positions on gram hash (doc_a < doc_b);
4. maximal runs via the islands trick: within (doc_a, doc_b,
   diagonal = pos_a − pos_b), consecutive positions share
   `pos_a − row_number()`, so one keyed window + one aggregate turns
   position hits into (start_a, start_b, n_tokens) runs.

At 100 TB: the gram index is corpus-sized but partitions by hash; the
df table is gram-vocabulary-sized; the pairwise stage is linear in
TRUE duplication (bounded by the df cap), and the islands window keys
on (doc_a, doc_b, diagonal) — cardinality ~runs, never corpus-wide.
The df cap bounds a gram's spread ACROSS documents; a gram repeated
heavily WITHIN one document multiplies positions instead — that
pathology is the repetition filter's job (`operators/quality.py`),
which runs upstream of positional dedup in a real pipeline.

Reference parity: deltacat has no positional dedup; this extends the
dedup family (SURVEY.md §2 addendum) beyond `segment_dedup_keep_first`
(line-level) and `dup_ngram_fraction` (doc-level fraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from deltacat_spark.workloads.base import load

_K = 8  # gram width (tokens)
_MIN_RUN = 10  # report runs of at least this many tokens
_DF_CAP = 50  # stop-gram bound: grams in more docs than this never pair


def repeated_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-doc repeated token runs ≥ `_MIN_RUN` tokens:
    (doc_a, doc_b, start_a, start_b, n_tokens), 1-based token
    positions, longest first."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    grams = (
        docs.select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x <> '')").alias("ws"),
        )
        .filter(F.size("ws") >= _K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {_K - 1}),"
                    f" j -> struct(j AS pos,"
                    f" md5(array_join(slice(ws, j, {_K}), ' ')) AS gh))"
                )
            ).alias("t"),
        )
        .select("doc_id", "t.pos", "t.gh")
        # two consumers (df table + pair join) — checkpoint so the
        # gram build runs once, not once per branch (the jaccard_pairs
        # lesson from r7/r8)
        .localCheckpoint(eager=False)
    )
    shared = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _DF_CAP))
        .select("gh")
    )
    g = grams.join(shared, "gh")
    a = g.select(
        F.col("gh"), F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa")
    )
    b = g.select(
        F.col("gh"), F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    hits = a.join(b, "gh").filter(F.col("doc_a") < F.col("doc_b"))
    w = Window.partitionBy(
        "doc_a", "doc_b", F.col("pa") - F.col("pb")
    ).orderBy("pa")
    runs = (
        hits.select(
            "doc_a",
            "doc_b",
            "pa",
            "pb",
            (F.col("pa") - F.row_number().over(w)).alias("island"),
            (F.col("pa") - F.col("pb")).alias("diag"),
        )
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(_K - 1)).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= _MIN_RUN)
    )
    return runs.select(
        "doc_a",
        "doc_b",
        F.col("start_a").cast("int").alias("start_a"),
        F.col("start_b").cast("int").alias("start_b"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    ).orderBy(F.desc("n_tokens"), "doc_a", "doc_b", "start_a")


RUNS_SQL = f"""
WITH grams AS (
  SELECT doc_id, u.t.pos AS pos, u.t.gh AS gh
  FROM (SELECT doc_id,
               list_filter(str_split(text, ' '), x -> x <> '') AS ws
        FROM documents),
       unnest(list_transform(range(1, len(ws) - {_K - 2}),
              j -> {{'pos': j,
                     'gh': md5(array_to_string(ws[j:j + {_K - 1}], ' '))}}))
         AS u(t)
  WHERE len(ws) >= {_K}),
shared AS (
  SELECT gh FROM grams GROUP BY gh
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {_DF_CAP}),
g AS (SELECT grams.* FROM grams JOIN shared USING (gh)),
hits AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id),
runs AS (
  SELECT doc_a, doc_b,
         CAST(MIN(pa) AS INT) AS start_a,
         CAST(MIN(pb) AS INT) AS start_b,
         CAST(COUNT(*) + {_K - 1} AS INT) AS n_tokens
  FROM (SELECT *,
               pa - row_number() OVER (
                 PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS island
        FROM hits)
  GROUP BY doc_a, doc_b, pa - pb, island)
SELECT doc_a, doc_b, start_a, start_b, n_tokens
FROM runs WHERE n_tokens >= {_MIN_RUN}
ORDER BY n_tokens DESC, doc_a, doc_b, start_a
"""


QUERIES = {
    "repeated_substring_runs": (repeated_substring_runs, RUNS_SQL),
}
