"""Corpus sampling / mixing / sequence-packing operators.

Training-data pipeline surface past dedup: deciding WHAT of the corpus
to train on (per-stratum mixing rates), and HOW rows become model inputs
(packing documents into fixed-token context windows). Both are
deterministic-by-construction — md5-hash gates and order-defined
windows — so a 100 TB pipeline re-run (or a different engine) selects
byte-identical training sets; no RNG state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from deltacat_spark.localdf import local_df

from deltacat_spark.workloads.base import md5_prefix_int

# md5 6-hex-char prefix space: rates map to integer thresholds in [0, 16^6].
_HASH_SPACE = 16 ** 6


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
) -> DataFrame:
    """Deterministic per-stratum sampling (data-mixing weights).

    A row survives iff md5(id) mod-space falls under its stratum's rate
    threshold — reproducible across runs and engines, unlike
    `df.sample`'s RNG. The rate table is a handful of rows and
    BROADCASTS; the corpus is filtered map-side with no shuffle at all
    (the right shape for "resample 100 TB with new mixing weights").
    Strata absent from `rates` are dropped (rate 0).
    """
    spark = df.sparkSession
    rate_rows = [(k, int(v * _HASH_SPACE)) for k, v in sorted(rates.items())]
    dim = local_df(spark, rate_rows, f"{strata_col} string, __thr long")
    return (
        df.join(F.broadcast(dim), strata_col)
        .filter(
            md5_prefix_int(F.col(id_col).cast("string"), 6) < F.col("__thr")
        )
        .drop("__thr")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int = 2048,
    partition_col: str | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign each document the context-window
    index its preceding cumulative token count falls into.

    ``seq_id = floor(tokens_before / max_tokens)`` over an id-ordered
    running sum — the streaming-packing assignment, fully declarative
    (one window, no UDFs). With `partition_col` the window partitions
    (packing happens within each shard — the scale form: a global
    ordered window would funnel 100 TB through one task; per-shard
    packing is embarrassingly parallel and is how packing actually runs,
    one stream per input shard). Returns the input plus `seq_id`.
    """
    w = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    ).orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum(F.col(tokens_col)).over(w), F.lit(0))
    return df.withColumn(
        "seq_id", F.floor(before / F.lit(float(max_tokens))).cast("long")
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: "dict[str, float] | None" = None,
    nchars: int = 6,
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 prefix of the id
    (an integer uniform on [0, 16^nchars)) is partitioned by cumulative
    split fractions — every engine, run, and shard assigns the same doc
    to the same split with no RNG and no shuffle (pure projection, fully
    whole-stage-codegen). Same digest family as `stratified_sample`'s
    keep gate; disjoint + exhaustive by construction.

    Returns the input with a `split` column; fractions must sum to ≤ 1
    (any remainder falls into the LAST split, keeping it exhaustive).
    """
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not splits:
        raise ValueError("need at least one split")
    total = 16 ** nchars
    h = md5_prefix_int(F.col(id_col).cast("string"), nchars)
    names = list(splits)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(int(cum * total))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", out)


def domain_cap(
    df: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 50,
) -> DataFrame:
    """Keep at most `cap` documents per domain/source (the Common-Crawl
    per-host cap that stops one boilerplate-heavy domain from dominating
    a mixture). Selection is deterministic: rows rank by md5(id) within
    their domain, so every engine/run keeps the same winners — no RNG.

    Scale shape: ONE shuffle on `key_col`. `row_number` streams each
    domain's partition, so memory is O(1) per task, but a single
    mega-domain still lands on one task (sort-spill, not OOM). For a
    100 TB corpus with pathological hosts, pre-gate with
    `stratified_sample` at an approximate per-domain rate (map-side,
    zero shuffle) so the exact windowed cap only sees ~cap×constant
    rows per domain.
    """
    order = md5_prefix_int(F.col(id_col).cast("string"), 6)
    w = Window.partitionBy(key_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 50,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row draws a pseudo-uniform u from md5(id) and
    ranks by u^(1/w); the global top-k is a weight-proportional sample.

    Engine-exact ordering: rank on ``score_micro = floor(1e6·ln(u)/w)``
    — the double ln is evaluated once per row on identical rational
    inputs in both engines and floored to an integer before any
    comparison (the `lm_quality_score`/DSIR discipline), with
    (score, id) total-order tie-breaks. Higher is better (both factors
    negative: heavier w divides the negative ln toward 0).

    Scale shape: pure projection + one TakeOrdered top-k — no shuffle
    of the corpus, no RNG state, re-runs and backfills select the same
    rows. The classic use: weight = quality score or token count when
    drawing a fixed-size training subset from 100 TB.

    Precondition: weights must be strictly positive. A-ES is undefined
    otherwise — ln(u)/w flips sign for w<0 (ranking garbage above every
    valid row) and NULL/zero weights yield NULL/±inf scores that
    silently vanish from or dominate the top-k — so invalid weights
    fail loudly here (one cheap short-circuit probe, same discipline as
    the CHECK-constraint path) instead of corrupting the sample.
    """
    bad = df.filter(
        F.col(weight_col).isNull() | (F.col(weight_col) <= 0)
    )
    if bad.take(1):
        raise ValueError(
            f"weighted_sample_topk: weight column {weight_col!r} must be "
            "strictly positive and non-null for every row (Efraimidis-"
            "Spirakis u^(1/w) is undefined otherwise); filter or fix the "
            "weights before sampling"
        )
    u = (md5_prefix_int(F.col(id_col).cast("string"), 6) + 1) / F.lit(
        float(_HASH_SPACE + 1)
    )
    score = F.floor(F.lit(1_000_000.0) * F.log(u) / F.col(weight_col)).cast(
        "long"
    )
    return (
        df.withColumn("score_micro", score)
        .orderBy(F.desc("score_micro"), F.col(id_col))
        .limit(k)
    )
