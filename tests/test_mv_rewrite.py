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


JOIN_SQL = (
    "SELECT s.grp, sum(s.v) AS total, max(d.label) AS label "
    "FROM src s JOIN dim d ON s.grp = d.grp GROUP BY s.grp"
)


@pytest.fixture()
def cat2(cat):
    cat.create_table(
        "dim",
        schema=Schema(
            [
                Field("grp", T.StringType(), merge_key=True),
                Field("label", T.StringType()),
            ]
        ),
    )
    cat.sql("INSERT INTO dim VALUES ('a', 'alpha'), ('b', 'beta')")
    cat.create_materialized_view("mv_join", JOIN_SQL)
    return cat


def _jrows(df):
    return {(r.grp, r.total, r.label) for r in df.collect()}


def test_multi_table_mv_bootstrap_and_noop(cat2):
    assert _jrows(cat2.read_table("mv_join")) == {
        ("a", 30, "alpha"),
        ("b", 5, "beta"),
    }
    assert cat2.refresh_materialized_view("mv_join")["mode"] == "noop"


def test_multi_table_mv_rebuilds_when_either_source_moves(cat2):
    cat2.sql("INSERT INTO src VALUES (4, 'b', 100)")
    audit = cat2.refresh_materialized_view("mv_join")
    assert audit["mode"] == "rebuild"
    assert _jrows(cat2.read_table("mv_join")) == {
        ("a", 30, "alpha"),
        ("b", 105, "beta"),
    }
    cat2.sql("UPDATE dim SET label = 'BETA' WHERE grp = 'b'")
    assert cat2.refresh_materialized_view("mv_join")["mode"] == "rebuild"
    assert ("b", 105, "BETA") in _jrows(cat2.read_table("mv_join"))


def test_multi_table_mv_rewrite_freshness_gates_on_all_sources(cat2):
    got = cat2.sql(JOIN_SQL)
    assert cat2.last_sql_rewrite == "mv_join"
    assert _jrows(got) == {("a", 30, "alpha"), ("b", 5, "beta")}
    # moving EITHER source invalidates the rewrite
    cat2.sql("INSERT INTO dim VALUES ('c', 'gamma')")
    got = cat2.sql(JOIN_SQL)
    assert cat2.last_sql_rewrite is None
    assert _jrows(got) == {("a", 30, "alpha"), ("b", 5, "beta")}
    cat2.refresh_materialized_view("mv_join")
    cat2.sql(JOIN_SQL)
    assert cat2.last_sql_rewrite == "mv_join"


def test_mv_rewrite_never_applies_inside_transactions(cat):
    """A transaction's SELECT must see its own buffered writes — the MV
    rewrite (which reads committed MV contents) must not shadow the
    read-your-writes overlay. txn.sql bypasses Catalog.sql entirely;
    this pins that contract."""
    with cat.transaction() as txn:
        txn.sql("INSERT INTO src VALUES (9, 'a', 1000)")
        got = _rows(txn.sql(MV_SQL))
        assert got == {("a", 3, 1030), ("b", 1, 5)}, (
            "txn SELECT served stale MV contents instead of the overlay"
        )
    # outside: committed now, MV stale, direct evaluation reflects it
    got = cat.sql(MV_SQL)
    assert cat.last_sql_rewrite is None
    assert _rows(got) == {("a", 3, 1030), ("b", 1, 5)}


def test_show_materialized_views_and_sql_create_multi(cat2):
    # SQL-path CREATE of a multi-table MV
    cat2.sql(
        "CREATE MATERIALIZED VIEW mv_pairs AS "
        "SELECT s.grp, count(*) AS n FROM src s "
        "JOIN dim d ON s.grp = d.grp GROUP BY s.grp"
    )
    rows = {
        r["name"]: (r["sources"], r["refresh_mode"], r["fresh"])
        for r in cat2.sql("SHOW MATERIALIZED VIEWS").collect()
    }
    assert rows["mv_totals"] == ("src", "incremental_agg", True)
    assert rows["mv_join"][1] == "rebuild_multi" and rows["mv_join"][2]
    assert set(rows["mv_pairs"][0].split(",")) == {"src", "dim"}
    cat2.sql("INSERT INTO src VALUES (7, 'c', 1)")
    rows = {
        r["name"]: r["fresh"]
        for r in cat2.sql("SHOW MATERIALIZED VIEWS").collect()
    }
    assert not rows["mv_totals"] and not rows["mv_join"]


def test_mv_rewrite_respects_restore_on_either_side(cat):
    """RESTORE moves a table's version FORWARD (a restore is a new
    commit), so restoring the SOURCE strands the MV's watermark and
    restoring the MV strands its recorded watermark — both must
    disable the rewrite until an explicit refresh."""
    cat.sql("INSERT INTO src VALUES (4, 'b', 100)")
    cat.refresh_materialized_view("mv_totals")
    cat.sql(MV_SQL)
    assert cat.last_sql_rewrite == "mv_totals"
    # restore the SOURCE back one version → src.version bumps, MV stale
    v = cat.snapshot("src").version
    cat.restore_table("src", version=v - 1)
    got = cat.sql(MV_SQL)
    assert cat.last_sql_rewrite is None
    assert _rows(got) == {("a", 2, 30), ("b", 1, 5)}
    cat.refresh_materialized_view("mv_totals")
    cat.sql(MV_SQL)
    assert cat.last_sql_rewrite == "mv_totals"
    # restore the MV ITSELF to its bootstrap version → stale watermark
    cat.restore_table("mv_totals", version=1)
    cat.sql(MV_SQL)
    assert cat.last_sql_rewrite is None


def test_mv_rewrite_never_hits_time_travel_reads(cat):
    """`FROM src VERSION AS OF n` is rewritten to a pinned view BEFORE
    MV matching, so a time-travel read can never be served by the MV
    (whose contents track the current version)."""
    cat.sql("INSERT INTO src VALUES (4, 'b', 100)")
    cat.refresh_materialized_view("mv_totals")
    v = cat.snapshot("src").version
    q = MV_SQL.replace("FROM src", f"FROM src VERSION AS OF {v - 1}")
    got = _rows(cat.sql(q))
    assert cat.last_sql_rewrite is None
    assert got == {("a", 2, 30), ("b", 1, 5)}


def test_create_or_replace_rebuilds_with_new_definition(cat):
    """REPLACE with UNCHANGED sources must not no-op into the old
    definition's contents (review finding: the stale watermark would
    have let the rewrite serve the old SQL's rows as the new one's)."""
    new_sql = "SELECT grp, sum(v) AS total FROM src GROUP BY grp"
    cat.create_materialized_view("mv_totals", new_sql, replace=True)
    rows = {
        (r.grp, r.total) for r in cat.read_table("mv_totals").collect()
    }
    assert rows == {("a", 30), ("b", 5)}
    got = cat.sql(new_sql)
    assert cat.last_sql_rewrite == "mv_totals"
    assert {(r.grp, r.total) for r in got.collect()} == rows
    # the OLD definition must no longer match anything
    cat.sql(MV_SQL)
    assert cat.last_sql_rewrite is None


def test_order_by_queries_never_rewritten(cat, spark):
    """An ORDER BY answer is ordered; a table read is not — the rewrite
    must refuse rather than drop the ordering."""
    q = MV_SQL + " ORDER BY grp"
    cat.create_materialized_view("mv_ordered", q)
    out = cat.sql(q)
    assert cat.last_sql_rewrite is None
    assert [r.grp for r in out.collect()] == ["a", "b"]


def test_multi_refresh_leaves_no_pinned_bare_views(cat2, spark):
    """_refresh_mv_multi pins per-source snapshots under PRIVATE view
    names; the bare table names must not be left shadowed by pinned
    views (review finding: raw spark.sql would read stale snapshots)."""
    cat2.sql("INSERT INTO src VALUES (5, 'a', 7)")
    cat2.register_view("src")  # current view, pre-refresh
    cat2.refresh_materialized_view("mv_join")
    cat2.sql("INSERT INTO src VALUES (6, 'b', 8)")
    cat2.register_view("src")
    n = spark.sql("SELECT count(*) AS n FROM src").collect()[0]["n"]
    assert n == 5, "bare 'src' view was clobbered by a pinned snapshot"


def test_dead_incarnation_watermark_is_stale(cat):
    """Watermark PAST the source's current version (source dropped and
    recreated) must read as stale on every freshness surface."""
    cat.sql("INSERT INTO src VALUES (4, 'b', 1)")
    cat.sql("INSERT INTO src VALUES (5, 'b', 1)")
    cat.refresh_materialized_view("mv_totals")
    cat.drop_table("src")
    cat.create_table(
        "src",
        schema=Schema(
            [
                Field("id", T.LongType()),
                Field("grp", T.StringType()),
                Field("v", T.LongType()),
            ]
        ),
    )
    cat.sql("INSERT INTO src VALUES (1, 'z', 2)")
    # rewrite refuses
    got = cat.sql(MV_SQL)
    assert cat.last_sql_rewrite is None
    assert {(r.grp, r.n, r.total) for r in got.collect()} == {("z", 1, 2)}
    # SHOW agrees
    rows = {
        r["name"]: r["fresh"]
        for r in cat.sql("SHOW MATERIALIZED VIEWS").collect()
    }
    assert rows["mv_totals"] is False
    # refresh rebuilds instead of no-opping on the dead watermark
    audit = cat.refresh_materialized_view("mv_totals")
    assert audit["mode"] != "noop"
    assert {
        (r.grp, r.n, r.total) for r in cat.read_table("mv_totals").collect()
    } == {("z", 1, 2)}


def test_normalize_sql_properties():
    """The rewrite matcher's normalizer: idempotent, literal-preserving
    (content AND case), whitespace/case-collapsing outside literals."""
    from hypothesis import given, settings, strategies as st

    from deltacat_spark.catalog.catalog import _normalize_sql

    sql_chars = st.text(
        alphabet="abcXYZ09_ ()*,=<>.\n\t;'", min_size=0, max_size=80
    )

    @given(sql_chars)
    @settings(max_examples=300, deadline=None)
    def run(q):
        n1 = _normalize_sql(q)
        assert _normalize_sql(n1) == n1, "not idempotent"
        # balanced-quote inputs: literal contents survive byte-for-byte
        if q.count("'") % 2 == 0:
            import re

            for lit in re.findall(r"'[^']*'", q):
                assert lit in n1

    run()
    # pinned cases
    assert _normalize_sql("SELECT  A\nFROM t ;;") == "select a from t"
    assert _normalize_sql("SELECT 'AbC' FROM t") == "select 'AbC' from t"
    assert (
        _normalize_sql("select 'it''s'  X") == "select 'it''s' x"
    ), "escaped quote must stay inside the literal"


def test_explain_statement(cat):
    plan = cat.sql("EXPLAIN SELECT grp FROM src WHERE grp = 'a'").collect()
    assert len(plan) == 1 and "Physical Plan" in plan[0]["plan"]
    # EXPLAIN surfaces the MV routing decision
    plan = cat.sql(f"EXPLAIN {MV_SQL}").collect()[0]["plan"]
    assert "Materialized View Rewrite" in plan and "mv_totals" in plan
    # formatted mode passes through; non-read statements are rejected
    plan = cat.sql("EXPLAIN FORMATTED SELECT count(*) FROM src").collect()
    assert "Physical Plan" in plan[0]["plan"]
    with pytest.raises(ValueError, match="read statements"):
        cat.sql("EXPLAIN INSERT INTO src VALUES (9, 'z', 1)")
