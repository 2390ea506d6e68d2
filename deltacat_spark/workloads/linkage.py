"""Entity resolution — blocked fuzzy matching over a distinct-entity
table, the record-linkage shape every large-scale curation pipeline
needs (merging near-identical product/author/source names before
joining corpora).

The scale discipline is the order of operations: the corpus FIRST
collapses to the distinct-entity table with support counts (one
map-side-combinable hash-aggregate whose output is vocabulary-sized —
here 64 names regardless of row count), and only then does pairwise
work happen. Candidate generation runs entirely over the entity table:
a blocking key (the head noun) bounds each block, the self-join stays
inside blocks, and the levenshtein verify runs on |block|² entity
pairs — never on corpus rows. At 100 TB the entity table is still
vocabulary-sized (names repeat; that is why ER exists), so the
pairing cost is independent of corpus size; a pathological block is
capped the same way LSH buckets are (see `operators/dedupe.py`
star caps) — documented here, unnecessary at this vocabulary.

Both engines ship the same classic Wagner-Fischer `levenshtein`, so
the verify is exact on both sides — no UDF, no Python in the loop.

Reference parity: deltacat has no record-linkage operators; this
extends the LLM-pipeline surface (SURVEY.md §2 addendum) alongside
the dedup family (`dedup_exact`, `dedup_minhash_lsh`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.workloads.base import load

_MAX_DIST = 3


def er_fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match distinct part names within head-noun blocks.

    Output: (name_a, name_b, dist, support_a, support_b) for every
    unordered pair of DISTINCT names sharing a blocking key with
    levenshtein distance ≤ 3 — the merge candidates an ER pipeline
    would feed to survivorship. Support counts are corpus-sized facts
    computed in the same entity-collapse aggregate, so the pairwise
    stage never touches a corpus row.
    """
    part = load(spark, sf_dir, "part", spread=True).select("p_name")
    ent = (
        part.groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("support"))
        # coalesce to '' so a single-token name matches DuckDB's
        # split_part semantics (empty string, not NULL — NULL would
        # silently drop the entity from the self-join on Spark only)
        .withColumn(
            "blk",
            F.coalesce(F.element_at(F.split("name", " "), 2), F.lit("")),
        )
    )
    a = ent.select(
        F.col("name").alias("name_a"),
        F.col("support").alias("support_a"),
        "blk",
    )
    b = ent.select(
        F.col("name").alias("name_b"),
        F.col("support").alias("support_b"),
        "blk",
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("dist") <= _MAX_DIST)
    )
    return pairs.select(
        "name_a", "name_b", "dist", "support_a", "support_b"
    ).orderBy("dist", "name_a", "name_b")


ER_FUZZY_SQL = f"""
WITH ent AS (
  SELECT p_name AS name,
         CAST(COUNT(*) AS BIGINT) AS support,
         split_part(p_name, ' ', 2) AS blk
  FROM part GROUP BY p_name)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist,
       a.support AS support_a, b.support AS support_b
FROM ent a JOIN ent b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {_MAX_DIST}
ORDER BY dist, name_a, name_b
"""


QUERIES = {
    "er_fuzzy_match_parts": (er_fuzzy_match_parts, ER_FUZZY_SQL),
}
