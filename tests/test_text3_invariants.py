"""Analytic invariants for the round-6 curation operators — the oracle
gate proves Spark==DuckDB, these prove the shared formula itself does
what the operator claims (the verify-skill lesson: an oracle agrees
with a wrong query if both sides encode the same bug).
"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sfspark(spark):
    # REUSE the conftest session-scoped SparkSession. Building a second
    # session here and stop()ping it would kill the process-wide
    # SparkContext and take down every test file that runs after this
    # one (observed: 15 late-suite failures with
    # "'NoneType' object has no attribute 'sc'").
    return spark


def test_token_budget_greedy_maximality(sfspark):
    """Kept set must (a) fit the budget, (b) be a PREFIX of the quality
    order — adding the first dropped doc must overflow the budget."""
    from deltacat_spark.workloads.text3 import (
        _BUDGET_DEN,
        _BUDGET_NUM,
        token_budget_select,
    )
    from deltacat_spark.workloads.base import load
    from pyspark.sql import functions as F

    out = token_budget_select(sfspark, SF)
    d = load(sfspark, SF, "documents").select("doc_id", "n_chars")
    rows = (
        out.join(d, "doc_id")
        .select("doc_id", "toks", "keep", "n_chars")
        .collect()
    )
    total = sum(r.toks for r in rows)
    budget = total * _BUDGET_NUM // _BUDGET_DEN
    ordered = sorted(rows, key=lambda r: (-r.n_chars, r.doc_id))
    kept = [r for r in ordered if r.keep]
    kept_toks = sum(r.toks for r in kept)
    assert kept_toks <= budget
    # prefix property: no kept doc after a dropped one
    flags = [r.keep for r in ordered]
    assert flags == sorted(flags, reverse=True), "kept set is not a prefix"
    first_dropped = next((r for r in ordered if not r.keep), None)
    if first_dropped is not None:
        assert kept_toks + first_dropped.toks > budget, "not maximal"


def test_segment_dedup_each_segment_kept_exactly_once(sfspark):
    """Corpus-wide: #kept instances == #distinct segment texts, and the
    kept instance is the (doc_id, seg_idx)-minimal occurrence."""
    from deltacat_spark.workloads.text3 import (
        _SEG_W,
        segment_dedup_keep_first,
    )
    from deltacat_spark.workloads.base import load
    from pyspark.sql import functions as F

    out = segment_dedup_keep_first(sfspark, SF)
    agg = out.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_segments").alias("total")
    ).collect()[0]
    d = load(sfspark, SF, "documents")
    tk = F.split(F.col("text"), " ")
    segs = d.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, (size(split(text, ' ')) - 1) div {_SEG_W}),"
                f" i -> array_join(slice(split(text, ' '), i * {_SEG_W} + 1, {_SEG_W}), ' '))"
            )
        ).alias("seg")
    )
    n_distinct = segs.distinct().count()
    n_total = segs.count()
    assert agg.kept == n_distinct
    assert agg.total == n_total
    # dedup must actually bite on this corpus (premise check)
    assert agg.kept < agg.total


def test_source_keyness_is_over_representation(sfspark):
    """Every reported token must really be over-represented: its share
    inside the source exceeds its share outside (keyness > 1000 implies
    a/A > b/B modulo the +1 smoothing)."""
    from deltacat_spark.workloads.text3 import source_keyness
    from deltacat_spark.workloads.base import load
    from pyspark.sql import functions as F

    out = source_keyness(sfspark, SF).collect()
    assert out, "no keyness rows at sf0.001"
    d = load(sfspark, SF, "documents")
    tot = (
        d.select("source", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("source")
        .count()
        .collect()
    )
    a_tot = {r.source: r["count"] for r in tot}
    g_tot = sum(a_tot.values())
    ranks_seen = {}
    for r in out:
        A = a_tot[r.source]
        B = g_tot - A
        if r.keyness > 1000:
            assert r.a * B > r.b * A, (
                f"{r.source}/{r.token} reported key but share_in <= share_out"
            )
        ranks_seen.setdefault(r.source, []).append(r.rank)
    for source, ranks in ranks_seen.items():
        assert ranks == list(range(1, len(ranks) + 1))


def test_json_props_rollup_counts_consistent(sfspark):
    from deltacat_spark.workloads.text3 import json_props_rollup
    from deltacat_spark.workloads.base import load
    from pyspark.sql import functions as F

    out = json_props_rollup(sfspark, SF).collect()
    assert out
    total = sum(r.n_events for r in out)
    assert total == load(sfspark, SF, "events").count()
    for r in out:
        assert r.n_with_k <= r.n_events
        assert r.k_distinct <= r.n_with_k
        if r.n_with_k:
            assert r.k_min <= r.k_max
            assert r.n_with_k * r.k_min <= r.k_sum <= r.n_with_k * r.k_max
