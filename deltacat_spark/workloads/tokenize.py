"""Tokenizer-training and corpus-encoding queries — the full BPE arc
(`operators/bpe.py`) under the driver's oracle gate.

`bpe_learn_merges` runs the complete iterative merge-learn loop on
Spark and is checked against a DuckDB oracle that UNROLLS the same
K iterations as chained CTEs (pair-count → argmax → `list_reduce`
fold rewrite per step) — the same unrolled-CTE discipline
`kmeans_lloyd_iters` uses for Lloyd iterations. Both engines share
the tie-break (count DESC, pair string ASC with a chr(1) separator)
and the left-to-right non-overlapping greedy fold, so the learned
rules match exactly.

`bpe_encode_tokens` closes the loop: tokenize the corpus under the
learned merges. The scale shape is the point — encoding is a
vocab-sized BROADCAST join (word → |symbol array|), never a re-fold
over corpus rows: the fold already happened once per distinct word
during training. At 100 TB the vocab table is still vocabulary-sized
and the encode is one map-side join + per-doc sum.

Reference parity: deltacat has no tokenizer operators; this extends
the LLM-pipeline surface (SURVEY.md §2 addendum) alongside
`bpe_pair_counts` / `oov_rate` / `token_budget_select`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from deltacat_spark.localdf import local_df

from deltacat_spark.operators.bpe import learn_bpe
from deltacat_spark.workloads.base import load

_N_MERGES = 6


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: (step, left_sym, right_sym, merged,
    cnt) for `_N_MERGES` BPE iterations over the documents corpus."""
    docs = load(spark, sf_dir, "documents", spread=True).select("text")
    merges, _ = learn_bpe(docs, "text", _N_MERGES)
    rows = [
        (i + 1, left, right, left + right, cnt)
        for i, (left, right, cnt) in enumerate(merges)
    ]
    return local_df(spark,
        rows,
        "step int, left_sym string, right_sym string,"
        " merged string, cnt bigint",
    ).orderBy("step")


def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the learned `_N_MERGES` merges:
    (doc_id, n_tokens). Encoding = broadcast word→|symbols| join."""
    docs = load(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    _, syms = learn_bpe(docs.select("text"), "text", _N_MERGES)
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    tok = syms.select("w", F.size("s").alias("n_tok"))
    return (
        words.join(F.broadcast(tok), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_tok").alias("n_tokens"))
        .orderBy("doc_id")
    )


def _bpe_ctes(k: int) -> str:
    """Unrolled-CTE BPE learn: v0 = char-split word-frequency table;
    per step i — p{i} adjacent-pair counts, b{i} argmax rule, v{i}
    greedy left-to-right fold rewrite via list_reduce (accumulator is
    a list-of-strings; first-element init matches Spark's
    fold-from-empty because the first step can never merge)."""
    ctes = [
        """v0 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt, str_split(w, '') AS s
  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w)"""
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""p{i} AS (
  SELECT u.p AS p, SUM(cnt) AS n
  FROM v{i - 1}, unnest(list_transform(range(0, len(s) - 1),
       j -> s[j + 1] || chr(1) || s[j + 2])) AS u(p)
  GROUP BY 1),
b{i} AS (
  SELECT split_part(p, chr(1), 1) AS l, split_part(p, chr(1), 2) AS r,
         CAST(n AS BIGINT) AS n
  FROM p{i} ORDER BY n DESC, p LIMIT 1),
v{i} AS (
  SELECT w, cnt,
    list_reduce(list_transform(s, x -> [x]),
      (acc, x) -> CASE WHEN acc[-1] = b{i}.l AND x[1] = b{i}.r
                  THEN acc[:len(acc) - 1] || [b{i}.l || b{i}.r]
                  ELSE acc || x END) AS s
  FROM v{i - 1}, b{i})"""
        )
    return ",\n".join(ctes)


BPE_LEARN_SQL = (
    "WITH "
    + _bpe_ctes(_N_MERGES)
    + "\nSELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"  SELECT CAST({i} AS INT) AS step, l AS left_sym,"
        f" r AS right_sym, l || r AS merged, n AS cnt FROM b{i}"
        for i in range(1, _N_MERGES + 1)
    )
    + "\n) ORDER BY step"
)

BPE_ENCODE_SQL = (
    "WITH "
    + _bpe_ctes(_N_MERGES)
    + f"""
SELECT t.doc_id, CAST(SUM(len(v{_N_MERGES}.s)) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS w
      FROM documents) t
JOIN v{_N_MERGES} ON t.w = v{_N_MERGES}.w
WHERE t.w <> ''
GROUP BY t.doc_id
ORDER BY t.doc_id"""
)


QUERIES = {
    "bpe_learn_merges": (bpe_learn_merges, BPE_LEARN_SQL),
    "bpe_encode_tokens": (bpe_encode_tokens, BPE_ENCODE_SQL),
}
