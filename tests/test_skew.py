"""Salted skew operators must produce exactly the unsalted results."""

from pyspark.sql import functions as F

from deltacat_spark.operators.skew import salted_aggregate, salted_join


def _skewed_df(spark):
    # one hot key (0) with 5000 rows, 50 cold keys with 10 each
    hot = spark.range(5000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).alias("v")
    )
    cold = spark.range(500).select(
        (F.col("id") % 50 + 1).alias("k"), (F.col("id") % 31).alias("v")
    )
    return hot.unionAll(cold)


def test_salted_aggregate_matches_direct(spark):
    df = _skewed_df(spark)
    direct = {
        (r.k): (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mn, r.mx)
        for r in salted_aggregate(
            df,
            ["k"],
            {"n": "count()", "s": "sum(v)", "mn": "min(v)", "mx": "max(v)"},
            salt=16,
        ).collect()
    }
    assert salted == direct


def test_salted_aggregate_is_deterministic(spark):
    df = _skewed_df(spark)
    a = salted_aggregate(df, ["k"], {"s": "sum(v)"}, salt=8).collect()
    b = salted_aggregate(df, ["k"], {"s": "sum(v)"}, salt=8).collect()
    assert sorted((r.k, r.s) for r in a) == sorted((r.k, r.s) for r in b)


def test_salted_join_matches_direct(spark):
    big = _skewed_df(spark)
    small = spark.range(51).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    direct = sorted(
        (r.k, r.v, r.w) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.w)
        for r in salted_join(big, small, "k", salt=4).collect()
    )
    assert salted == direct


def test_salted_join_left_outer(spark):
    big = _skewed_df(spark)
    # small side misses key 0 → hot rows must still survive a left join
    small = spark.range(1, 51).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    direct = sorted(
        (r.k, r.v, r.w) for r in big.join(small, "k", "left").collect()
    )
    salted = sorted(
        (r.k, r.v, r.w)
        for r in salted_join(big, small, "k", salt=4, how="left").collect()
    )
    assert salted == direct
