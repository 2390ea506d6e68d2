"""Expression AST → Column compiler tests (reference expression tree
`storage/model/expression/expression.py:17-657`)."""

from deltacat_spark.plans.expr import col, lit


def test_compile_and_filter(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5), (3, "ab", 6)], "id long, s string, n int"
    )
    e = col("id").gt(1).and_(col("s").like("a%").or_(col("n").is_null()))
    out = df.filter(e.to_column())
    assert sorted(r.id for r in out.collect()) == [3]
    e2 = col("id").in_([1, 3]).not_()
    assert [r.id for r in df.filter(e2.to_column()).collect()] == [2]
    e3 = col("id").between(2, 3)
    assert sorted(r.id for r in df.filter(e3.to_column()).collect()) == [2, 3]


def test_skipping_predicates_extraction():
    e = (
        col("x").ge(10)
        .and_(col("y").eq(lit("a")))
        .and_(col("z").between(1, 5))
        .and_(col("w").like("a%"))  # not skippable — ignored
    )
    preds = e.skipping_predicates()
    assert ("x", ">=", 10) in preds
    assert ("y", "=", "a") in preds
    assert ("z", ">=", 1) in preds and ("z", "<=", 5) in preds
    assert all(p[0] != "w" for p in preds)


def test_or_is_conservative():
    e = col("x").ge(10).or_(col("y").eq(1))
    assert e.skipping_predicates() == []


def test_repr_sqlish():
    e = col("x").ge(10).and_(col("y").is_null())
    assert "x >= 10" in repr(e) and "IS NULL" in repr(e)
