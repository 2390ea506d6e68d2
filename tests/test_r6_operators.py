"""Analytic sanity bounds for the round-6 operators — the class of bug
an oracle comparison cannot catch (same formula wrong on both sides)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_kmeans_assign_is_argmin(spark):
    """Every vector's assigned centroid must be at least as close as the
    centroid of the vector's own seed label (argmin property)."""
    from deltacat_spark.workloads.similarity import (
        _KM_SCALE,
        _XQ_EXPR,
        kmeans_assign_step,
    )
    from deltacat_spark.workloads.base import load

    out = kmeans_assign_step(spark, SF)
    e = load(spark, SF, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode(F.expr(_XQ_EXPR)).alias("dim", "xq")
    )
    cent = (
        ex.groupBy("label", "dim")
        .agg(F.sum("xq").alias("sx"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("label").alias("cl"),
            "dim",
            F.floor(F.col("sx") / F.col("n")).cast("long").alias("c"),
        )
    )
    own = (
        ex.join(cent, (ex.label == cent.cl) & (ex.dim == cent.dim))
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("xq") - F.col("c")) * (F.col("xq") - F.col("c"))).alias(
                "own_dist"
            )
        )
    )
    bad = out.join(own, "vec_id").filter(F.col("dist") > F.col("own_dist"))
    assert bad.count() == 0
    # distances are non-negative and not all zero
    row = out.agg(F.min("dist"), F.max("dist")).collect()[0]
    assert row[0] >= 0 and row[1] > 0


def test_boilerplate_segments_bounds(spark):
    from deltacat_spark.workloads.text2 import (
        _BOILER_DF,
        _SEG_W,
        dedup_boilerplate_segments,
    )
    from deltacat_spark.workloads.base import load

    out = dedup_boilerplate_segments(spark, SF)
    rows = out.collect()
    assert rows, "no documents profiled"
    for r in rows:
        assert 0 <= r.n_boilerplate <= r.n_segments
        assert r.boiler_permille == r.n_boilerplate * 1000 // r.n_segments
    # segment accounting: total segments == sum over docs of
    # ((n_tokens - 1) div W) + 1 as built by the sequence/slice construction
    d = load(spark, SF, "documents")
    total_segments = sum(r.n_segments for r in rows)
    expected_total = (
        d.select(
            (F.expr(f"(size(split(text, ' ')) - 1) div {_SEG_W}") + 1).alias("k")
        )
        .agg(F.sum("k"))
        .collect()[0][0]
    )
    assert total_segments == expected_total
    # every flagged segment truly occurs in >= _BOILER_DF distinct docs:
    # spot-check via the df_counts the operator is built from
    segs = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, (size(split(text, ' ')) - 1) div {_SEG_W}),"
                f" i -> array_join(slice(split(text, ' '), i * {_SEG_W} + 1, {_SEG_W}), ' '))"
            )
        ).alias("seg_text"),
    )
    dfc = segs.groupBy("seg_text").agg(
        F.countDistinct("doc_id").alias("seg_df")
    )
    n_boiler_from_dfc = (
        segs.join(dfc, "seg_text")
        .filter(F.col("seg_df") >= _BOILER_DF)
        .count()
    )
    assert n_boiler_from_dfc == sum(r.n_boilerplate for r in rows)
