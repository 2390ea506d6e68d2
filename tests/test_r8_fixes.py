"""Round-8 regression tests for the round-7 advisor findings:

1. `jaccard_pairs(prefilter=True)` must be bit-identical to
   `prefilter=False` even when `df_cap` is set — stop-shingle document
   frequencies are defined over the FULL corpus, not the
   candidate-restricted index.
2. `_mv_record_wise` must classify any SQL with a subquery (IN/EXISTS/
   scalar) as full-rebuild — subqueries are not distributive over unions.
3. `SHOW CREATE TABLE` must not pin engine DEFAULT_PROPERTIES into the
   round-tripped DDL (only user-set / overridden keys).
4. Decimal covering-type promotion must never narrow integer-digit
   capacity; at the 38-digit boundary it gives up scale instead.
5. `FROM <T> VERSION AS OF n` resolves the table name case-insensitively
   like every other identifier in the SQL surface.
"""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "r8cat"))
    c.create_table(
        "users",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("name", T.StringType()),
                Field("age", T.IntegerType()),
            ]
        ),
    )
    c.sql(
        "INSERT INTO users VALUES (1, 'ann', 30), (2, 'bob', 40), (3, 'cy', 50)"
    )
    return c


# -- 1. jaccard_pairs df_cap under prefilter --------------------------------


def test_jaccard_prefilter_bit_identical_with_df_cap(spark):
    from deltacat_spark.operators.dedupe import jaccard_pairs

    # s1 appears in 3 docs: df=3 > cap=2 over the FULL corpus, so it must
    # be dropped from intersections — but only docs A and B are LSH
    # candidates, so a df table computed AFTER the candidate prefilter
    # would see df(s1)=2 and wrongly keep it.
    rows = [
        ("A", "s1"), ("A", "s2"), ("A", "s3"), ("A", "s4"), ("A", "a1"),
        ("B", "s1"), ("B", "s2"), ("B", "s3"), ("B", "s4"), ("B", "b1"),
        ("C", "s1"), ("C", "c1"), ("C", "c2"),
    ]
    shingles = spark.createDataFrame(rows, "doc_id string, shingle string")
    candidates = spark.createDataFrame(
        [("A", "B")], "doc_a string, doc_b string"
    )
    kw = dict(candidates=candidates, df_cap=2, threshold=0.1)
    on_ = jaccard_pairs(shingles, prefilter=True, **kw).collect()
    off = jaccard_pairs(shingles, prefilter=False, **kw).collect()
    assert len(on_) == len(off) == 1
    # n_inter = |{s2,s3,s4}| = 3 (s1 capped out), sizes 5 and 5:
    # jaccard = 3 / (5 + 5 - 3)
    assert on_[0].jaccard == off[0].jaccard == round(3 / 7, 6)


# -- 2. materialized-view classifier vs subqueries ---------------------------


def test_mv_subquery_forces_full_rebuild_classifier():
    rw = Catalog._mv_record_wise
    assert rw("SELECT id, name FROM t WHERE age > 10")
    assert not rw("SELECT * FROM t WHERE id NOT IN (SELECT id FROM t WHERE f)")
    assert not rw(
        "SELECT * FROM t a WHERE EXISTS (SELECT 1 FROM t b WHERE b.id = a.id)"
    )
    assert not rw("SELECT id, (SELECT max(x) FROM t) AS mx FROM t")
    # a literal containing the word select must NOT force a rebuild
    assert rw("SELECT id, 'select me' AS tag FROM t WHERE age > 1")


def test_mv_self_subquery_stays_exact_after_append(cat):
    cat.sql(
        "CREATE MATERIALIZED VIEW mv_keep AS"
        " SELECT id, name FROM users"
        " WHERE id NOT IN (SELECT id FROM users WHERE age >= 50)"
    )
    assert {r.id for r in cat.sql("SELECT * FROM mv_keep").collect()} == {1, 2}
    # appending a row that lands in the exclusion set must NOT leak into
    # the view — a (wrong) record-wise incremental refresh would append
    # transform(new rows) with the subquery evaluated over only the slice.
    cat.sql("INSERT INTO users VALUES (7, 'new', 70)")
    res = cat.sql("REFRESH MATERIALIZED VIEW mv_keep")
    assert "full" in res.collect()[0].operation
    assert {r.id for r in cat.sql("SELECT * FROM mv_keep").collect()} == {1, 2}


# -- 3. SHOW CREATE TABLE omits engine defaults ------------------------------


def test_show_create_omits_default_engine_properties(cat):
    ddl = cat.sql("SHOW CREATE TABLE users").collect()[0].create_statement
    assert "read_optimization" not in ddl
    assert "compaction.trigger" not in ddl
    assert "checkpoint.interval" not in ddl
    # an OVERRIDDEN engine key is user intent and must round-trip
    cat.create_table(
        "mor_t",
        schema=Schema([Field("a", T.LongType(), merge_key=True)]),
        properties={"read_optimization": "none", "owner": "me"},
    )
    ddl2 = cat.sql("SHOW CREATE TABLE mor_t").collect()[0].create_statement
    assert "'read_optimization'='none'" in ddl2
    assert "'owner'='me'" in ddl2
    assert "checkpoint.interval" not in ddl2


# -- 4. decimal promotion never narrows integer digits -----------------------


def test_decimal_promotion_keeps_integer_capacity():
    from deltacat_spark.schema import _promote

    got = _promote(T.DecimalType(38, 0), T.DecimalType(10, 10), "x")
    assert (got.precision, got.scale) == (38, 0)
    got = _promote(T.DecimalType(30, 5), T.DecimalType(20, 15), "x")
    # ints = max(25, 5) = 25; scale shrinks 15 -> 13 to fit 38
    assert (got.precision, got.scale) == (38, 13)
    # plain widening (no boundary) still takes the covering type
    got = _promote(T.DecimalType(10, 2), T.DecimalType(12, 4), "x")
    assert (got.precision, got.scale) == (12, 4)


# -- 5. case-insensitive time-travel table match -----------------------------


def test_time_travel_case_insensitive_table(cat):
    v0 = cat.snapshot("users").version
    cat.sql("UPDATE users SET age = 0")
    rows = cat.sql(f"SELECT id, age FROM Users VERSION AS OF {v0}").collect()
    assert {r.id: r.age for r in rows} == {1: 30, 2: 40, 3: 50}
    rows = cat.sql("SELECT id, age FROM USERS").collect()
    assert all(r.age == 0 for r in rows)
