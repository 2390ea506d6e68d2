"""Materialized-view query rewrite: a SELECT textually equivalent to a
registered MV's definition is answered from the MV table — but only
while the MV is FRESH (source watermark == source version). Staleness,
literal case, and the opt-out all fall through to direct evaluation."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema

MV_SQL = "SELECT grp, count(*) AS n, sum(v) AS total FROM src GROUP BY grp"


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "mvrw"))
    c.create_table(
        "src",
        schema=Schema(
            [
                Field("id", T.LongType()),
                Field("grp", T.StringType()),
                Field("v", T.LongType()),
            ]
        ),
    )
    c.sql("INSERT INTO src VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 5)")
    c.create_materialized_view("mv_totals", MV_SQL)
    return c


def _rows(df):
    return {(r.grp, r.n, r.total) for r in df.collect()}


def test_fresh_mv_answers_equivalent_select(cat):
    direct = _rows(cat.sql(MV_SQL, mv_rewrite=False))
    assert cat.last_sql_rewrite is None
    got = cat.sql(MV_SQL)
    assert cat.last_sql_rewrite == "mv_totals"
    assert _rows(got) == direct == {("a", 2, 30), ("b", 1, 5)}


def test_match_is_whitespace_and_case_insensitive_outside_literals(cat):
    q = "  select GRP,   count(*) as N, SUM(v) AS total\nFROM src GROUP BY grp ; "
    got = cat.sql(q)
    assert cat.last_sql_rewrite == "mv_totals"
    assert _rows(got) == {("a", 2, 30), ("b", 1, 5)}


def test_literal_content_must_match_exactly(cat, spark):
    lit_sql = "SELECT grp FROM src WHERE grp = 'a'"
    cat.create_materialized_view("mv_lit", lit_sql)
    cat.sql(lit_sql)
    assert cat.last_sql_rewrite == "mv_lit"
    # same statement, different literal CASE — must not rewrite
    out = cat.sql("SELECT grp FROM src WHERE grp = 'A'")
    assert cat.last_sql_rewrite is None
    assert out.count() == 0


def test_stale_mv_never_answers(cat):
    cat.sql("INSERT INTO src VALUES (4, 'b', 100)")
    got = cat.sql(MV_SQL)
    assert cat.last_sql_rewrite is None, "stale MV must not be used"
    assert _rows(got) == {("a", 2, 30), ("b", 2, 105)}
    # refresh restores the rewrite — and the refreshed contents
    cat.refresh_materialized_view("mv_totals")
    got = cat.sql(MV_SQL)
    assert cat.last_sql_rewrite == "mv_totals"
    assert _rows(got) == {("a", 2, 30), ("b", 2, 105)}


def test_opt_out_and_non_matching_queries(cat):
    cat.sql(MV_SQL, mv_rewrite=False)
    assert cat.last_sql_rewrite is None
    cat.sql("SELECT grp, count(*) AS n FROM src GROUP BY grp")
    assert cat.last_sql_rewrite is None
