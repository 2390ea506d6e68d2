"""Iterative BPE tokenizer training over a corpus — the full merge-learn
loop on top of the one-step pair statistic (`workloads/text4.py:
bpe_pair_counts`).

The scalable formulation real trainers use: the corpus collapses to the
WORD-FREQUENCY table once (one map-side-combinable shuffle, output is
vocabulary-sized); every merge iteration then runs entirely over the
vocab table — adjacent-pair counts weighted by word count, pick the
argmax pair, rewrite each word's symbol array with a left-to-right fold.
The corpus is never re-tokenized: iteration cost is O(|vocab| · avg
word length), independent of corpus row count, and the only driver
traffic is the single argmax row per merge.

Determinism: ties break on (count DESC, pair string ASC); the in-array
merge is a left-to-right non-overlapping fold (standard BPE greedy
application, so "aaa" under merge (a,a) becomes [aa, a]).

Reference parity: deltacat has no tokenizer-training operators; this
extends the LLM-pipeline surface (SURVEY.md §2 addendum) alongside
`bpe_pair_counts` / `oov_rate` / `token_budget_select`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from deltacat_spark.localdf import local_df

# Pair separator: a control codepoint that never appears in text
# tokens. Built with chr() so no invisible byte sits in this source
# file (the repo once lost an hour to an invisible \x01 literal).
_SEP = chr(1)


def _sql_quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    local_vocab_threshold: int = 65_536,
) -> "tuple[list[tuple[str, str, int]], DataFrame]":
    """Learn `n_merges` BPE merge rules; returns ([(left, right, count)]
    in merge order, the final symbol table (w, cnt, s)).

    Two-phase, like production trainers: the corpus collapses to the
    word-frequency table with ONE distributed aggregation, then the
    merge loop runs over that vocabulary-sized table. When the vocab
    fits under ``local_vocab_threshold`` rows (counted first — the
    common case: vocabulary grows with corpus *diversity*, not corpus
    size), the loop runs ON THE DRIVER via the same-tie-break local
    fold (`learn_bpe_merges_local`) — zero Spark jobs per merge instead
    of one vocab-shuffle + argmax round-trip each. Above the threshold
    the distributed loop below runs unchanged: one vocab-sized pair
    aggregation + a driver argmax (one row) + an in-array fold rewrite
    per iteration, localCheckpoint'ed so the lineage stays flat. Both
    paths produce identical merges and symbol tables (the local fold is
    the pinned equality oracle of the distributed one). The returned
    symbol table is the ENCODER: a word's token sequence under the
    learned merges is its `s` array, so tokenizing a corpus is a
    vocab-sized broadcast join — the corpus is never re-folded."""
    words = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    if local_vocab_threshold:
        # one corpus-sized aggregation job; everything after is sized
        # by the (bounded) vocabulary
        vocab = vocab.localCheckpoint(eager=True)
        if vocab.count() <= local_vocab_threshold:
            wc = {r["w"]: r["cnt"] for r in vocab.collect()}
            merges = learn_bpe_merges_local(wc, n_merges)
            spark = df.sparkSession
            sym_rows = []
            for w, c in wc.items():
                out: list[str] = []
                for x in w:  # char split, then replay merges in order
                    out.append(x)
                for a, b, _n in merges:
                    folded: list[str] = []
                    for x in out:
                        if folded and folded[-1] == a and x == b:
                            folded[-1] = a + b
                        else:
                            folded.append(x)
                    out = folded
                sym_rows.append((w, c, out))
            syms = local_df(spark,
                sym_rows, "w string, cnt bigint, s array<string>"
            )
            return merges, syms
    syms = vocab.select(
        "w", "cnt", F.split(F.col("w"), "").alias("s")
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            syms.filter(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(s) - 2),"
                        " i -> concat(s[i], char(1), s[i + 1]))"
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "p").limit(1).collect()
        if not top:
            break
        left, right = top[0]["p"].split(_SEP, 1)
        merges.append((left, right, int(top[0]["n"])))
        la, rb = _sql_quote(left), _sql_quote(right)
        merged = _sql_quote(left + right)
        # Left-to-right non-overlapping merge as an aggregate fold: the
        # accumulator's last element merges with x when it equals the
        # left symbol and x the right — standard greedy BPE application.
        syms = syms.withColumn(
            "s",
            F.expr(
                "aggregate(s, CAST(array() AS ARRAY<STRING>),"
                " (acc, x) -> CASE"
                f" WHEN size(acc) > 0 AND element_at(acc, -1) = '{la}'"
                f"      AND x = '{rb}'"
                f" THEN concat(slice(acc, 1, size(acc) - 1),"
                f"             array('{merged}'))"
                " ELSE concat(acc, array(x)) END)"
            ),
        ).localCheckpoint(eager=False)
    return merges, syms


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> "list[tuple[str, str, int]]":
    """Merge rules only — see :func:`learn_bpe`."""
    return learn_bpe(df, text_col, n_merges)[0]


def learn_bpe_merges_local(
    word_counts: "dict[str, int]", n_merges: int = 10
) -> "list[tuple[str, str, int]]":
    """Pure-Python reference implementation (same tie-breaks) — the
    equality oracle for `learn_bpe_merges` in tests."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + c
                )
        if not counts:
            break
        best = min(
            counts.items(),
            key=lambda kv: (-kv[1], kv[0][0] + _SEP + kv[0][1]),
        )
        (a, b), n = best
        merges.append((a, b, n))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges
