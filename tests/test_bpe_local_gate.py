"""r15 optimization pin: `learn_bpe`'s vocab-gated local merge loop must
be bit-identical to the distributed loop (merges AND symbol table) —
the gate only moves WHERE the vocab-sized loop runs, never what it
computes."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    rows = [
        ("low low lower lowest",),
        ("new newer newest low",),
        ("wide wider widest new new",),
        ("er er est est low newer",),
    ]
    return spark.createDataFrame(rows, "text string")


def test_local_gate_matches_distributed(docs):
    from deltacat_spark.operators.bpe import learn_bpe

    m_local, syms_local = learn_bpe(docs, "text", 6)
    m_dist, syms_dist = learn_bpe(
        docs, "text", 6, local_vocab_threshold=0
    )
    assert m_local == m_dist
    rows_l = {
        r["w"]: (r["cnt"], list(r["s"]))
        for r in syms_local.collect()
    }
    rows_d = {
        r["w"]: (r["cnt"], list(r["s"]))
        for r in syms_dist.collect()
    }
    assert rows_l == rows_d


def test_gate_threshold_forces_distributed(docs):
    """A threshold below the vocab size must take the distributed
    path and still agree with the pure-Python oracle."""
    from deltacat_spark.operators.bpe import (
        learn_bpe,
        learn_bpe_merges_local,
    )

    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    wc = {r["w"]: r["count"] for r in words}
    assert len(wc) > 3
    m_dist, _ = learn_bpe(docs, "text", 4, local_vocab_threshold=3)
    assert m_dist == learn_bpe_merges_local(wc, 4)
