"""Incremental maintenance of AGGREGATING materialized views: the new
slice is aggregated alone and merged group-by-group into the keyed MV
(COUNT/SUM add, MIN/MAX least/greatest) — refresh cost O(new data +
touched groups), exact equality with a full recompute asserted at every
step, and non-insert windows still fall back to the exact rebuild."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.catalog.materialize import parse_agg_view
from deltacat_spark.schema import Field, Schema

MV_SQL = (
    "SELECT grp, count(*) AS n, sum(v) AS total, "
    "min(v) AS lo, max(v) AS hi FROM src GROUP BY grp"
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "mvagg"))
    # Append-only source: INSERTs land as APPEND deltas, the shape the
    # insert-only incremental guard admits (a keyed source's MERGE
    # upserts can update rows, so they correctly force a rebuild).
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
    return c


def _expected(cat):
    return {
        (r.grp, r.n, r.total, r.lo, r.hi)
        for r in cat.sql(MV_SQL.replace("src", "__x")
                         .replace("FROM __x", "FROM src")).collect()
    }


def _mv_rows(cat):
    return {
        (r.grp, r.n, r.total, r.lo, r.hi)
        for r in cat.read_table("agg_mv").collect()
    }


def test_parse_agg_view_shapes():
    assert parse_agg_view(MV_SQL) == {
        "group_cols": ["grp"],
        "aggs": [
            {"func": "count", "alias": "n"},
            {"func": "sum", "alias": "total"},
            {"func": "min", "alias": "lo"},
            {"func": "max", "alias": "hi"},
        ],
    }
    # WHERE is fine; expressions inside aggregates are fine
    assert parse_agg_view(
        "SELECT a, b, sum(x * y) AS s FROM t WHERE x > 0 GROUP BY a, b"
    ) == {
        "group_cols": ["a", "b"],
        "aggs": [{"func": "sum", "alias": "s"}],
    }
    # rejected shapes → None (exact full rebuild keeps correctness)
    for bad in (
        "SELECT grp, avg(v) AS m FROM t GROUP BY grp",
        "SELECT grp, count(DISTINCT v) AS n FROM t GROUP BY grp",
        "SELECT grp, sum(v) AS s FROM t GROUP BY grp HAVING sum(v) > 0",
        "SELECT grp, sum(v) FROM t GROUP BY grp",  # unaliased agg
        "SELECT grp, sum(v) AS s FROM t JOIN u USING (k) GROUP BY grp",
        "SELECT grp, sum(v) AS s FROM t GROUP BY grp ORDER BY s",
        "SELECT upper(grp) AS g, sum(v) AS s FROM t GROUP BY g",
        "SELECT grp, sum(v) AS s, extra FROM t GROUP BY grp",
    ):
        assert parse_agg_view(bad) is None, bad


def test_agg_mv_bootstrap_is_keyed(cat):
    audit = cat.create_materialized_view("agg_mv", MV_SQL)
    assert audit["mode"] == "full"
    assert _mv_rows(cat) == _expected(cat)
    # the MV table carries its group columns as merge keys
    assert sorted(cat.snapshot("agg_mv").schema.merge_keys) == ["grp"]


def test_agg_mv_incremental_touches_only_new_groups(cat):
    cat.create_materialized_view("agg_mv", MV_SQL)
    cat.sql("INSERT INTO src VALUES (4, 'a', 1), (5, 'c', 7)")
    audit = cat.refresh_materialized_view("agg_mv")
    assert audit["mode"] == "incremental_agg"
    assert audit["touched_groups"] == 2  # 'a' merged, 'c' created; 'b' untouched
    assert _mv_rows(cat) == _expected(cat)
    # min/max actually merged, not overwritten
    rows = {r.grp: r for r in cat.read_table("agg_mv").collect()}
    assert rows["a"].lo == 1 and rows["a"].hi == 20 and rows["a"].n == 3
    assert rows["b"].n == 1  # untouched group intact


def test_agg_mv_multiple_refresh_rounds(cat):
    cat.create_materialized_view("agg_mv", MV_SQL)
    for i in range(3):
        cat.sql(f"INSERT INTO src VALUES ({10 + i}, 'b', {100 + i})")
        audit = cat.refresh_materialized_view("agg_mv")
        assert audit["mode"] == "incremental_agg"
        assert _mv_rows(cat) == _expected(cat)
    # noop short-circuit
    assert cat.refresh_materialized_view("agg_mv")["mode"] == "noop"


def test_agg_mv_nonappend_window_rebuilds(cat):
    cat.create_materialized_view("agg_mv", MV_SQL)
    cat.sql("DELETE FROM src WHERE id = 2")
    audit = cat.refresh_materialized_view("agg_mv")
    assert audit["mode"] == "full"  # MIN/MAX cannot retract — exact rebuild
    assert _mv_rows(cat) == _expected(cat)
    # and the rebuild result keeps refreshing incrementally afterwards
    cat.sql("INSERT INTO src VALUES (6, 'a', 2)")
    audit = cat.refresh_materialized_view("agg_mv")
    assert audit["mode"] == "incremental_agg"
    assert _mv_rows(cat) == _expected(cat)


def test_agg_mv_all_null_sum_slice(cat, spark):
    """A refresh window whose SUM slice is all-NULL must keep the old
    total (the null-side coalesce in the combiner)."""
    cat.create_materialized_view("agg_mv", MV_SQL)
    df = spark.createDataFrame(
        [(7, "a", None)], "id long, grp string, v long"
    )
    cat.write_to_table(df, "src", mode="append")
    audit = cat.refresh_materialized_view("agg_mv")
    assert audit["mode"] == "incremental_agg"
    assert _mv_rows(cat) == _expected(cat)
    rows = {r.grp: r for r in cat.read_table("agg_mv").collect()}
    assert rows["a"].total == 30 and rows["a"].n == 3


def test_agg_mv_sql_statement_path(cat):
    """The SQL surface classifies and refreshes through the same path."""
    res = cat.sql(
        f"CREATE MATERIALIZED VIEW agg_mv AS {MV_SQL}"
    ).collect()[0]
    assert "full" in res.operation
    cat.sql("INSERT INTO src VALUES (8, 'd', 3)")
    res = cat.sql("REFRESH MATERIALIZED VIEW agg_mv").collect()[0]
    assert "incremental_agg" in res.operation
    assert _mv_rows(cat) == _expected(cat)


def test_agg_mv_source_restore_forces_rebuild(cat):
    """RESTORE rewrites history — the refresh window is no longer
    insert-only, so the next refresh must be the exact rebuild."""
    v0 = cat.snapshot("src").version
    cat.create_materialized_view("agg_mv", MV_SQL)
    cat.sql("INSERT INTO src VALUES (20, 'z', 1)")
    cat.refresh_materialized_view("agg_mv")
    cat.sql(f"RESTORE TABLE src TO VERSION AS OF {v0}")
    audit = cat.refresh_materialized_view("agg_mv")
    assert audit["mode"] == "full"
    assert _mv_rows(cat) == _expected(cat)
    assert not any(r[0] == "z" for r in _mv_rows(cat))


def test_agg_mv_source_schema_evolution_is_benign(cat, spark):
    """Adding a column the view doesn't read (ALTER + auto-evolved
    appends) keeps the incremental path — the window stays
    insert-family."""
    cat.create_materialized_view("agg_mv", MV_SQL)
    df = spark.createDataFrame(
        [(30, "a", 4, "note")], "id long, grp string, v long, extra string"
    )
    cat.write_to_table(df, "src", mode="append")
    audit = cat.refresh_materialized_view("agg_mv")
    assert audit["mode"] == "incremental_agg"
    assert _mv_rows(cat) == _expected(cat)


def test_streaming_agg_mv(cat, tmp_path):
    """Streaming aggregate MV: each micro-batch merges its partials
    group-by-group inside the watermark-stamped commit — stream result
    equals the full recompute across restarts."""
    from deltacat_spark.catalog.materialize import (
        parse_agg_view,
        stream_refresh_incremental,
    )

    spec = parse_agg_view(MV_SQL)
    assert spec is not None

    def transform(df):
        df.createOrReplaceTempView("__sagg_src")
        return df.sparkSession.sql(MV_SQL.replace("src", "__sagg_src"))

    ck = str(tmp_path / "ck")
    q = stream_refresh_incremental(
        cat, "src", "agg_mv", transform, ck, agg_spec=spec
    )
    q.awaitTermination(120)
    assert _mv_rows(cat) == _expected(cat)
    # more inserts, restart the stream on the same checkpoint
    cat.sql("INSERT INTO src VALUES (50, 'a', 99), (51, 'e', 1)")
    cat.sql("INSERT INTO src VALUES (52, 'e', 2)")
    q = stream_refresh_incremental(
        cat, "src", "agg_mv", transform, ck, agg_spec=spec
    )
    q.awaitTermination(120)
    assert _mv_rows(cat) == _expected(cat)
    rows = {r.grp: r for r in cat.read_table("agg_mv").collect()}
    assert rows["a"].hi == 99 and rows["e"].n == 2


# -- keyed (MERGE/DELETE) incremental maintenance ----------------------

KMV_SQL = (
    "SELECT grp, count(*) AS n, sum(v) AS total, "
    "min(v) AS lo, max(v) AS hi FROM ksrc GROUP BY grp"
)


@pytest.fixture()
def kcat(spark, tmp_path):
    """Merge-keyed MoR source: MERGE/DELETE commits land as deltas that
    `read_changes` surfaces row-level — the shape the keyed incremental
    path (`_touched_keys_for_window`) admits."""
    c = Catalog(spark, str(tmp_path / "mvaggk"))
    c.create_table(
        "ksrc",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("grp", T.StringType()),
                Field("v", T.LongType()),
            ]
        ),
        properties={"read_optimization": "none"},
    )
    c.sql(
        "INSERT INTO ksrc VALUES "
        "(1, 'a', 10), (2, 'a', 20), (3, 'b', 5), (4, 'c', 7)"
    )
    return c


def _k_expected(cat):
    return {
        (r.grp, r.n, r.total, r.lo, r.hi)
        for r in cat.sql(KMV_SQL).collect()
    }


def _k_mv_rows(cat):
    return {
        (r.grp, r.n, r.total, r.lo, r.hi)
        for r in cat.read_table("kmv").collect()
    }


def test_keyed_mv_update_in_place(kcat):
    kcat.create_materialized_view("kmv", KMV_SQL)
    kcat.alter_table("kmv", properties={"mv.keyed_gate": "100"})
    kcat.sql("INSERT INTO ksrc VALUES (2, 'a', 99)")  # upsert id=2
    audit = kcat.refresh_materialized_view("kmv")
    assert audit["mode"] == "incremental_agg_keyed"
    assert _k_mv_rows(kcat) == _k_expected(kcat)
    rows = {r.grp: r for r in kcat.read_table("kmv").collect()}
    assert rows["a"].total == 109 and rows["a"].hi == 99 and rows["a"].n == 2


def test_keyed_mv_min_max_exact_after_delete(kcat):
    """Deleting the MAX row of a group — pure retraction arithmetic
    cannot recover the new max; the touched-group recompute can."""
    kcat.create_materialized_view("kmv", KMV_SQL)
    kcat.alter_table("kmv", properties={"mv.keyed_gate": "100"})
    kcat.sql("DELETE FROM ksrc WHERE id = 2")  # group a's max (20)
    audit = kcat.refresh_materialized_view("kmv")
    assert audit["mode"] == "incremental_agg_keyed"
    rows = {r.grp: r for r in kcat.read_table("kmv").collect()}
    assert (rows["a"].n, rows["a"].total, rows["a"].hi) == (1, 10, 10)
    assert _k_mv_rows(kcat) == _k_expected(kcat)


def test_keyed_mv_group_move(kcat):
    kcat.create_materialized_view("kmv", KMV_SQL)
    kcat.alter_table("kmv", properties={"mv.keyed_gate": "100"})
    kcat.sql("INSERT INTO ksrc VALUES (3, 'a', 5)")  # id=3 moves b -> a
    audit = kcat.refresh_materialized_view("kmv")
    assert audit["mode"] == "incremental_agg_keyed"
    assert _k_mv_rows(kcat) == _k_expected(kcat)
    groups = {r.grp for r in kcat.read_table("kmv").collect()}
    assert "b" not in groups  # vanished group's MV row deleted


def test_keyed_mv_group_vanish_and_return(kcat):
    kcat.create_materialized_view("kmv", KMV_SQL)
    kcat.alter_table("kmv", properties={"mv.keyed_gate": "100"})
    kcat.sql("DELETE FROM ksrc WHERE grp = 'c'")  # non-key predicate
    audit = kcat.refresh_materialized_view("kmv")
    assert audit["mode"] == "incremental_agg_keyed"
    assert _k_mv_rows(kcat) == _k_expected(kcat)
    assert "c" not in {r.grp for r in kcat.read_table("kmv").collect()}
    kcat.sql("INSERT INTO ksrc VALUES (9, 'c', 3)")
    kcat.refresh_materialized_view("kmv")
    assert _k_mv_rows(kcat) == _k_expected(kcat)


def test_keyed_mv_multi_commit_window(kcat):
    kcat.create_materialized_view("kmv", KMV_SQL)
    kcat.alter_table("kmv", properties={"mv.keyed_gate": "100"})
    kcat.sql("INSERT INTO ksrc VALUES (5, 'd', 1)")   # new key+group
    kcat.sql("INSERT INTO ksrc VALUES (1, 'a', 11)")  # update
    kcat.sql("DELETE FROM ksrc WHERE id = 4")         # group c vanishes
    audit = kcat.refresh_materialized_view("kmv")
    assert audit["mode"] == "incremental_agg_keyed"
    assert _k_mv_rows(kcat) == _k_expected(kcat)


def test_keyed_mv_cow_window_rebuilds(spark, tmp_path):
    """CoW MERGE without CDC sidecars is invisible to read_changes —
    the keyed path must refuse and rebuild exactly."""
    c = Catalog(spark, str(tmp_path / "mvaggcow"))
    c.create_table(
        "ksrc",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("grp", T.StringType()),
                Field("v", T.LongType()),
            ]
        ),
    )  # default read_optimization=max (CoW), no cdc.enabled
    c.sql("INSERT INTO ksrc VALUES (1, 'a', 10), (3, 'b', 5)")
    c.create_materialized_view("kmv", KMV_SQL)
    c.sql("INSERT INTO ksrc VALUES (1, 'a', 77)")
    audit = c.refresh_materialized_view("kmv")
    assert audit["mode"] == "full"
    assert _k_mv_rows(c) == _k_expected(c)


@pytest.mark.slow
def test_keyed_mv_model_random(kcat):
    """Model-random extension: a seeded op sequence (upserts, inserts,
    key deletes, predicate deletes) with a refresh after every commit —
    the MV must equal the full recompute at every step and never take
    the full-rebuild path."""
    import random

    rng = random.Random(909)
    kcat.create_materialized_view("kmv", KMV_SQL)
    kcat.alter_table("kmv", properties={"mv.keyed_gate": "100"})
    groups = ["a", "b", "c", "d", None]
    next_id = 10
    for step in range(14):
        op = rng.choice(["upsert", "insert", "del_key", "del_grp"])
        if op == "insert":
            g = rng.choice(groups)
            gs = "NULL" if g is None else f"'{g}'"
            kcat.sql(
                f"INSERT INTO ksrc VALUES ({next_id}, {gs}, {rng.randint(0, 50)})"
            )
            next_id += 1
        elif op == "upsert":
            ids = [r.id for r in kcat.read_table("ksrc").collect()]
            if not ids:
                continue
            g = rng.choice(groups)
            gs = "NULL" if g is None else f"'{g}'"
            kcat.sql(
                f"INSERT INTO ksrc VALUES ({rng.choice(ids)}, {gs}, "
                f"{rng.randint(0, 50)})"
            )
        elif op == "del_key":
            ids = [r.id for r in kcat.read_table("ksrc").collect()]
            if not ids:
                continue
            kcat.sql(f"DELETE FROM ksrc WHERE id = {rng.choice(ids)}")
        else:
            g = rng.choice(groups[:-1])
            kcat.sql(f"DELETE FROM ksrc WHERE grp = '{g}'")
        audit = kcat.refresh_materialized_view("kmv")
        assert audit["mode"] in (
            "incremental_agg_keyed",
            "noop",
        ), f"step {step}: unexpected {audit['mode']}"
        assert _k_mv_rows(kcat) == _k_expected(kcat), f"step {step} ({op})"


# -- keyed RECORD-WISE MVs (round 9) ----------------------------------

RW_SQL = "SELECT id, grp, v * 2 AS v2 FROM ksrc WHERE v < 100"


def _rw_expected(cat):
    return {(r.id, r.grp, r.v2) for r in cat.sql(RW_SQL).collect()}


def _rw_rows(cat):
    return {(r.id, r.grp, r.v2) for r in cat.read_table("rmv").collect()}


def test_record_keyed_mv_bootstrap_and_update(kcat):
    kcat.create_materialized_view("rmv", RW_SQL)
    kcat.alter_table("rmv", properties={"mv.keyed_gate": "100"})
    assert _rw_rows(kcat) == _rw_expected(kcat)
    # the MV is keyed on the source merge key
    assert kcat.snapshot("rmv").schema.merge_keys == ["id"]
    kcat.sql("INSERT INTO ksrc VALUES (2, 'a', 33)")  # upsert id=2
    audit = kcat.refresh_materialized_view("rmv")
    assert audit["mode"] == "incremental_record_keyed"
    assert _rw_rows(kcat) == _rw_expected(kcat)


def test_record_keyed_mv_filter_vanish_and_return(kcat):
    kcat.create_materialized_view("rmv", RW_SQL)
    kcat.alter_table("rmv", properties={"mv.keyed_gate": "100"})
    kcat.sql("INSERT INTO ksrc VALUES (3, 'b', 500)")  # leaves WHERE v<100
    audit = kcat.refresh_materialized_view("rmv")
    assert audit["mode"] == "incremental_record_keyed"
    assert _rw_rows(kcat) == _rw_expected(kcat)
    assert 3 not in {r.id for r in kcat.read_table("rmv").collect()}
    kcat.sql("INSERT INTO ksrc VALUES (3, 'b', 8)")  # re-enters the filter
    kcat.refresh_materialized_view("rmv")
    assert _rw_rows(kcat) == _rw_expected(kcat)


def test_record_keyed_mv_source_delete(kcat):
    kcat.create_materialized_view("rmv", RW_SQL)
    kcat.alter_table("rmv", properties={"mv.keyed_gate": "100"})
    kcat.sql("DELETE FROM ksrc WHERE grp = 'a'")  # non-key predicate
    audit = kcat.refresh_materialized_view("rmv")
    assert audit["mode"] == "incremental_record_keyed"
    assert _rw_rows(kcat) == _rw_expected(kcat)


def test_record_keyed_mv_requires_identity_keys(kcat):
    """A view that transforms the key column must NOT take the keyed
    path (derived rows aren't addressable by source key)."""
    kcat.create_materialized_view(
        "rmv", "SELECT id * 2 AS id, grp FROM ksrc"
    )
    kcat.sql("INSERT INTO ksrc VALUES (1, 'a', 42)")
    audit = kcat.refresh_materialized_view("rmv")
    assert audit["mode"] == "full"


@pytest.mark.slow
def test_record_keyed_mv_model_random(kcat):
    import random

    rng = random.Random(1217)
    kcat.create_materialized_view("rmv", RW_SQL)
    kcat.alter_table("rmv", properties={"mv.keyed_gate": "100"})
    next_id = 50
    for step in range(10):
        op = rng.choice(["upsert", "insert", "del"])
        if op == "insert":
            kcat.sql(
                f"INSERT INTO ksrc VALUES ({next_id}, "
                f"'{rng.choice('abcd')}', {rng.randint(0, 150)})"
            )
            next_id += 1
        elif op == "upsert":
            ids = [r.id for r in kcat.read_table("ksrc").collect()]
            if not ids:
                continue
            kcat.sql(
                f"INSERT INTO ksrc VALUES ({rng.choice(ids)}, "
                f"'{rng.choice('abcd')}', {rng.randint(0, 150)})"
            )
        else:
            ids = [r.id for r in kcat.read_table("ksrc").collect()]
            if not ids:
                continue
            kcat.sql(f"DELETE FROM ksrc WHERE id = {rng.choice(ids)}")
        audit = kcat.refresh_materialized_view("rmv")
        assert audit["mode"] in ("incremental_record_keyed", "noop"), (
            f"step {step}: {audit}"
        )
        assert _rw_rows(kcat) == _rw_expected(kcat), f"step {step} ({op})"


# -- two-table JOIN MVs: first-order delta maintenance (round 9) -------

JOIN_SQL = (
    "SELECT x.k AS k, x.va AS va, y.vb AS vb "
    "FROM ja x JOIN jb y ON x.k = y.k WHERE x.va + y.vb < 1000"
)


def _j_setup(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "mvjoin"))
    a = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, va long")
    b = spark.createDataFrame([(1, 100), (2, 200)], "k long, vb long")
    c.create_table("ja")
    c.create_table("jb")
    c.write_to_table(a, "ja", mode="append")
    c.write_to_table(b, "jb", mode="append")
    return c


def _j_rows(c):
    return sorted(
        (r.k, r.va, r.vb) for r in c.read_table("join_mv").collect()
    )


def _j_expected(c):
    return sorted((r.k, r.va, r.vb) for r in c.sql(JOIN_SQL).collect())


def test_join_mv_incremental_left_right_both(spark, tmp_path):
    c = _j_setup(spark, tmp_path)
    c.create_materialized_view("join_mv", JOIN_SQL)
    assert _j_rows(c) == _j_expected(c)
    # left-only window
    c.write_to_table(
        spark.createDataFrame([(2, 21)], "k long, va long"), "ja", mode="append"
    )
    audit = c.refresh_materialized_view("join_mv")
    assert audit["mode"] == "incremental_join"
    assert _j_rows(c) == _j_expected(c)
    # right-only window
    c.write_to_table(
        spark.createDataFrame([(3, 300)], "k long, vb long"), "jb", mode="append"
    )
    audit = c.refresh_materialized_view("join_mv")
    assert audit["mode"] == "incremental_join"
    assert _j_rows(c) == _j_expected(c)
    # both sides move in one window — the cross term must land ONCE
    c.write_to_table(
        spark.createDataFrame([(4, 40)], "k long, va long"), "ja", mode="append"
    )
    c.write_to_table(
        spark.createDataFrame([(4, 400)], "k long, vb long"), "jb", mode="append"
    )
    audit = c.refresh_materialized_view("join_mv")
    assert audit["mode"] == "incremental_join"
    assert _j_rows(c) == _j_expected(c)
    # unmoved sources: noop
    assert c.refresh_materialized_view("join_mv")["mode"] == "noop"


def test_join_mv_where_filters_delta(spark, tmp_path):
    """Rows whose join output fails the WHERE never enter the MV via
    either delta term."""
    c = _j_setup(spark, tmp_path)
    c.create_materialized_view("join_mv", JOIN_SQL)
    c.write_to_table(
        spark.createDataFrame([(1, 999)], "k long, va long"), "ja", mode="append"
    )
    audit = c.refresh_materialized_view("join_mv")
    assert audit["mode"] == "incremental_join"
    assert _j_rows(c) == _j_expected(c)


def test_join_mv_outer_join_rebuilds(spark, tmp_path):
    c = _j_setup(spark, tmp_path)
    sql = (
        "SELECT x.k AS k, x.va AS va, y.vb AS vb "
        "FROM ja x LEFT JOIN jb y ON x.k = y.k"
    )
    c.create_materialized_view("join_mv", sql)
    c.write_to_table(
        spark.createDataFrame([(9, 90)], "k long, va long"), "ja", mode="append"
    )
    audit = c.refresh_materialized_view("join_mv")
    assert audit["mode"] == "rebuild"  # null-extension is not distributive
    got = sorted((r.k, r.va, r.vb) for r in c.read_table("join_mv").collect())
    exp = sorted((r.k, r.va, r.vb) for r in c.sql(sql).collect())
    assert got == exp


def test_join_mv_replace_window_rebuilds(spark, tmp_path):
    c = _j_setup(spark, tmp_path)
    c.create_materialized_view("join_mv", JOIN_SQL)
    b2 = spark.createDataFrame([(1, 111), (3, 333)], "k long, vb long")
    c.write_to_table(b2, "jb", mode="replace")
    audit = c.refresh_materialized_view("join_mv")
    assert audit["mode"] == "rebuild"
    assert _j_rows(c) == _j_expected(c)


def test_join_mv_model_random(spark, tmp_path):
    import random

    rng = random.Random(417)
    c = _j_setup(spark, tmp_path)
    c.create_materialized_view("join_mv", JOIN_SQL)
    for step in range(12):
        side = rng.choice(["ja", "jb", "both", "none"])
        if side in ("ja", "both"):
            c.write_to_table(
                spark.createDataFrame(
                    [(rng.randint(1, 8), rng.randint(0, 600))],
                    "k long, va long",
                ),
                "ja",
                mode="append",
            )
        if side in ("jb", "both"):
            c.write_to_table(
                spark.createDataFrame(
                    [(rng.randint(1, 8), rng.randint(0, 600))],
                    "k long, vb long",
                ),
                "jb",
                mode="append",
            )
        audit = c.refresh_materialized_view("join_mv")
        expect_mode = "noop" if side == "none" else "incremental_join"
        assert audit["mode"] == expect_mode, f"step {step}: {audit}"
        assert _j_rows(c) == _j_expected(c), f"step {step} ({side})"


def test_single_table_mv_replace_window_rebuilds(spark, tmp_path):
    """Pre-existing hole found by the join-MV tests: REPLACE commits
    record their new generation as an APPEND delta (+ removes), so the
    insert-only window check must not admit them — an incremental
    append would keep the dead generation's derived rows."""
    c = Catalog(spark, str(tmp_path / "mvrepl"))
    c.create_table("src9")
    c.write_to_table(
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string"),
        "src9",
        mode="append",
    )
    sql = "SELECT id, s FROM src9 WHERE id > 0"
    c.create_materialized_view("rmv9", sql)
    c.write_to_table(
        spark.createDataFrame([(7, "z")], "id long, s string"),
        "src9",
        mode="replace",
    )
    audit = c.refresh_materialized_view("rmv9")
    assert audit["mode"] == "full"
    got = sorted((r.id, r.s) for r in c.read_table("rmv9").collect())
    assert got == [(7, "z")]


# -- join + GROUP BY MVs: delta partial-agg maintenance (round 9) ------

JAGG_SQL = (
    "SELECT g, COUNT(*) AS n, SUM(v + w) AS sv, "
    "MIN(v) AS lo, MAX(w) AS hi "
    "FROM fa JOIN fb ON fa.k = fb.k2 "
    "WHERE v >= 0 GROUP BY g"
)


def _jagg_setup(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "mvjagg"))
    a = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 20), (3, "y", 5)], "k long, g string, v long"
    )
    b = spark.createDataFrame([(1, 100), (2, 200), (3, 7)], "k2 long, w long")
    c.create_table("fa")
    c.create_table("fb")
    c.write_to_table(a, "fa", mode="append")
    c.write_to_table(b, "fb", mode="append")
    return c


def _jagg_rows(c):
    return {
        (r.g, r.n, r.sv, r.lo, r.hi)
        for r in c.read_table("jagg_mv").collect()
    }


def _jagg_expected(c):
    return {
        (r.g, r.n, r.sv, r.lo, r.hi) for r in c.sql(JAGG_SQL).collect()
    }


def test_join_agg_mv_bootstrap_keyed_and_incremental(spark, tmp_path):
    from deltacat_spark.catalog.materialize import parse_join_agg_view

    spec = parse_join_agg_view(JAGG_SQL)
    assert spec == {
        "group_cols": ["g"],
        "aggs": [
            {"func": "count", "alias": "n"},
            {"func": "sum", "alias": "sv"},
            {"func": "min", "alias": "lo"},
            {"func": "max", "alias": "hi"},
        ],
    }
    c = _jagg_setup(spark, tmp_path)
    c.create_materialized_view("jagg_mv", JAGG_SQL)
    assert c.snapshot("jagg_mv").schema.merge_keys == ["g"]
    assert _jagg_rows(c) == _jagg_expected(c)
    # left append touches existing group
    c.write_to_table(
        spark.createDataFrame([(2, "x", 30)], "k long, g string, v long"),
        "fa",
        mode="append",
    )
    audit = c.refresh_materialized_view("jagg_mv")
    assert audit["mode"] == "incremental_join_agg"
    assert _jagg_rows(c) == _jagg_expected(c)
    # right append fans out through OLD left rows only once
    c.write_to_table(
        spark.createDataFrame([(3, 70)], "k2 long, w long"), "fb", mode="append"
    )
    audit = c.refresh_materialized_view("jagg_mv")
    assert audit["mode"] == "incremental_join_agg"
    assert _jagg_rows(c) == _jagg_expected(c)
    # both sides + a brand-new group in one window
    c.write_to_table(
        spark.createDataFrame([(9, "z", 1)], "k long, g string, v long"),
        "fa",
        mode="append",
    )
    c.write_to_table(
        spark.createDataFrame([(9, 900)], "k2 long, w long"), "fb", mode="append"
    )
    audit = c.refresh_materialized_view("jagg_mv")
    assert audit["mode"] == "incremental_join_agg"
    assert _jagg_rows(c) == _jagg_expected(c)
    assert c.refresh_materialized_view("jagg_mv")["mode"] == "noop"


def test_join_agg_mv_replace_rebuilds(spark, tmp_path):
    c = _jagg_setup(spark, tmp_path)
    c.create_materialized_view("jagg_mv", JAGG_SQL)
    c.write_to_table(
        spark.createDataFrame([(1, 50)], "k2 long, w long"), "fb", mode="replace"
    )
    audit = c.refresh_materialized_view("jagg_mv")
    assert audit["mode"] == "rebuild"
    assert _jagg_rows(c) == _jagg_expected(c)
    # and incremental resumes afterwards
    c.write_to_table(
        spark.createDataFrame([(1, "x", 40)], "k long, g string, v long"),
        "fa",
        mode="append",
    )
    audit = c.refresh_materialized_view("jagg_mv")
    assert audit["mode"] == "incremental_join_agg"
    assert _jagg_rows(c) == _jagg_expected(c)


@pytest.mark.slow
def test_join_agg_mv_model_random(spark, tmp_path):
    import random

    rng = random.Random(1833)
    c = _jagg_setup(spark, tmp_path)
    c.create_materialized_view("jagg_mv", JAGG_SQL)
    nk = 20
    for step in range(10):
        side = rng.choice(["fa", "fb", "both"])
        if side in ("fa", "both"):
            c.write_to_table(
                spark.createDataFrame(
                    [
                        (
                            rng.randint(1, 12),
                            rng.choice("xyzw"),
                            rng.randint(0, 50),
                        )
                    ],
                    "k long, g string, v long",
                ),
                "fa",
                mode="append",
            )
        if side in ("fb", "both"):
            c.write_to_table(
                spark.createDataFrame(
                    [(rng.randint(1, 12), rng.randint(0, 500))],
                    "k2 long, w long",
                ),
                "fb",
                mode="append",
            )
        audit = c.refresh_materialized_view("jagg_mv")
        assert audit["mode"] == "incremental_join_agg", f"step {step}: {audit}"
        assert _jagg_rows(c) == _jagg_expected(c), f"step {step} ({side})"


def test_keyed_mv_cost_gate_falls_back_to_rebuild(kcat):
    """Default cost gate: a window touching most groups rebuilds (the
    group recompute would scan ~the whole table anyway) — exact either
    way, the gate is pure cost policy."""
    kcat.create_materialized_view("kmv", KMV_SQL)
    # touch every group: update one row in each
    kcat.sql("INSERT INTO ksrc VALUES (1, 'a', 11), (3, 'b', 6), (4, 'c', 8)")
    audit = kcat.refresh_materialized_view("kmv")
    assert audit["mode"] == "full"
    assert _k_mv_rows(kcat) == _k_expected(kcat)


def test_join_mv_corrupt_watermark_rebuilds(spark, tmp_path):
    """A corrupted per-source watermark string must fail CLOSED into the
    exact rebuild, not crash the refresh."""
    c = _j_setup(spark, tmp_path)
    c.create_materialized_view("join_mv", JOIN_SQL)
    from deltacat_spark.catalog.materialize import MV_SRC_VERSION

    c.alter_table("join_mv", properties={f"{MV_SRC_VERSION}.ja": "junk"})
    c.write_to_table(
        spark.createDataFrame([(5, 50)], "k long, va long"), "ja", mode="append"
    )
    audit = c.refresh_materialized_view("join_mv")
    assert audit["mode"] == "rebuild"
    assert _j_rows(c) == _j_expected(c)
    # and incremental resumes once the watermarks are sane again
    c.write_to_table(
        spark.createDataFrame([(6, 60)], "k long, va long"), "ja", mode="append"
    )
    assert c.refresh_materialized_view("join_mv")["mode"] == "incremental_join"
    assert _j_rows(c) == _j_expected(c)


def test_streaming_mv_survives_replace_window(cat, tmp_path):
    """A REPLACE mid-stream must NOT append the new generation onto the
    dead one: the sink's commit-log window check delegates the step to
    the batch refresh and the query keeps running."""
    from deltacat_spark.catalog.materialize import (
        parse_agg_view,
        stream_refresh_incremental,
    )

    spec = parse_agg_view(MV_SQL)

    def transform(df):
        df.createOrReplaceTempView("__srp_src")
        return df.sparkSession.sql(MV_SQL.replace("src", "__srp_src"))

    ck = str(tmp_path / "ck")
    q = stream_refresh_incremental(
        cat, "src", "agg_mv", transform, ck, agg_spec=spec
    )
    q.awaitTermination(120)
    assert _mv_rows(cat) == _expected(cat)
    # replace the whole source, then append on top
    cat.sql("INSERT OVERWRITE src VALUES (100, 'z', 7)")
    cat.sql("INSERT INTO src VALUES (101, 'z', 3)")
    q = stream_refresh_incremental(
        cat, "src", "agg_mv", transform, ck, agg_spec=spec
    )
    q.awaitTermination(120)
    assert _mv_rows(cat) == _expected(cat)
    got = {r.grp: r for r in cat.read_table("agg_mv").collect()}
    assert set(got) == {"z"} and got["z"].n == 2 and got["z"].total == 10


def test_streaming_mv_keyed_source_merge_windows(spark, tmp_path):
    """Streaming MV over a MERGE-keyed MoR source: every batch is a
    MERGE/DELETE window, the sink delegates each to the batch keyed
    machinery, and the stream result equals the full recompute."""
    from deltacat_spark.catalog.materialize import (
        parse_agg_view,
        stream_refresh_incremental,
    )

    c = Catalog(spark, str(tmp_path / "smvk"))
    c.create_table(
        "ksrc",
        schema=Schema(
            [
                Field("id", T.LongType(), merge_key=True),
                Field("grp", T.StringType()),
                Field("v", T.LongType()),
            ]
        ),
        properties={"read_optimization": "none"},
    )
    c.sql("INSERT INTO ksrc VALUES (1, 'a', 10), (2, 'b', 5)")
    spec = parse_agg_view(KMV_SQL)

    def transform(df):
        df.createOrReplaceTempView("__smk_src")
        return df.sparkSession.sql(KMV_SQL.replace("ksrc", "__smk_src"))

    ck = str(tmp_path / "ck")
    q = stream_refresh_incremental(
        c, "ksrc", "kmv", transform, ck, agg_spec=spec
    )
    q.awaitTermination(120)

    def expected():
        return {
            (r.grp, r.n, r.total, r.lo, r.hi)
            for r in c.sql(KMV_SQL).collect()
        }

    def got():
        return {
            (r.grp, r.n, r.total, r.lo, r.hi)
            for r in c.read_table("kmv").collect()
        }

    assert got() == expected()
    c.sql("INSERT INTO ksrc VALUES (1, 'a', 99)")  # upsert
    c.sql("DELETE FROM ksrc WHERE id = 2")         # group b vanishes
    q = stream_refresh_incremental(
        c, "ksrc", "kmv", transform, ck, agg_spec=spec
    )
    q.awaitTermination(120)
    assert got() == expected()
    assert "b" not in {r.grp for r in c.read_table("kmv").collect()}


# -- k-way (3-table) join MVs: telescoping delta (round 9) -------------

J3_SQL = (
    "SELECT x.k AS k, x.va AS va, y.vb AS vb, z.vc AS vc "
    "FROM ja x JOIN jb y ON x.k = y.k JOIN jc z ON y.k = z.k"
)

J3AGG_SQL = (
    "SELECT g, COUNT(*) AS n, SUM(va + vb + vc) AS s "
    "FROM ja JOIN jb ON ja.k = jb.k JOIN jc ON jb.k = jc.k "
    "GROUP BY g"
)


def _j3_setup(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "mvj3"))
    c.create_table("ja")
    c.create_table("jb")
    c.create_table("jc")
    c.write_to_table(
        spark.createDataFrame(
            [(1, "p", 10), (2, "p", 20), (3, "q", 30)],
            "k long, g string, va long",
        ),
        "ja",
        mode="append",
    )
    c.write_to_table(
        spark.createDataFrame([(1, 100), (2, 200)], "k long, vb long"),
        "jb",
        mode="append",
    )
    c.write_to_table(
        spark.createDataFrame([(1, 5), (3, 7)], "k long, vc long"),
        "jc",
        mode="append",
    )
    return c


def test_three_way_join_mv_incremental(spark, tmp_path):
    c = _j3_setup(spark, tmp_path)
    c.create_materialized_view("j3_mv", J3_SQL)

    def rows():
        return sorted(
            (r.k, r.va, r.vb, r.vc) for r in c.read_table("j3_mv").collect()
        )

    def exp():
        return sorted((r.k, r.va, r.vb, r.vc) for r in c.sql(J3_SQL).collect())

    assert rows() == exp()
    # every source moves in one window — all cross terms land once
    c.write_to_table(
        spark.createDataFrame([(4, "q", 40)], "k long, g string, va long"),
        "ja",
        mode="append",
    )
    c.write_to_table(
        spark.createDataFrame([(3, 300), (4, 400)], "k long, vb long"),
        "jb",
        mode="append",
    )
    c.write_to_table(
        spark.createDataFrame([(2, 9), (4, 11)], "k long, vc long"),
        "jc",
        mode="append",
    )
    audit = c.refresh_materialized_view("j3_mv")
    assert audit["mode"] == "incremental_join"
    assert rows() == exp()
    # middle-only window
    c.write_to_table(
        spark.createDataFrame([(1, 111)], "k long, vb long"), "jb", mode="append"
    )
    audit = c.refresh_materialized_view("j3_mv")
    assert audit["mode"] == "incremental_join"
    assert rows() == exp()
    assert c.refresh_materialized_view("j3_mv")["mode"] == "noop"


def test_three_way_join_agg_mv_incremental(spark, tmp_path):
    from deltacat_spark.catalog.materialize import parse_join_agg_view

    assert parse_join_agg_view(J3AGG_SQL, n_tables=3) is not None
    c = _j3_setup(spark, tmp_path)
    c.create_materialized_view("j3agg_mv", J3AGG_SQL)

    def rows():
        return {
            (r.g, r.n, r.s) for r in c.read_table("j3agg_mv").collect()
        }

    def exp():
        return {(r.g, r.n, r.s) for r in c.sql(J3AGG_SQL).collect()}

    assert rows() == exp()
    assert c.snapshot("j3agg_mv").schema.merge_keys == ["g"]
    c.write_to_table(
        spark.createDataFrame([(5, "r", 50)], "k long, g string, va long"),
        "ja",
        mode="append",
    )
    c.write_to_table(
        spark.createDataFrame([(5, 500)], "k long, vb long"), "jb", mode="append"
    )
    c.write_to_table(
        spark.createDataFrame([(5, 55), (1, 77)], "k long, vc long"),
        "jc",
        mode="append",
    )
    audit = c.refresh_materialized_view("j3agg_mv")
    assert audit["mode"] == "incremental_join_agg"
    assert rows() == exp()
    # REPLACE still rebuilds
    c.write_to_table(
        spark.createDataFrame([(1, 1)], "k long, vc long"), "jc", mode="replace"
    )
    audit = c.refresh_materialized_view("j3agg_mv")
    assert audit["mode"] == "rebuild"
    assert rows() == exp()


def test_record_keyed_mv_cost_gate(kcat):
    """Default record-path cost gate: a window touching most keys
    rebuilds (point-wise maintenance would cost more than one pass)."""
    kcat.create_materialized_view("rgate_mv", RW_SQL.replace("rmv", "rgate"))
    # the fixture SQL targets ksrc; touch 3 of its 4 keys in one window
    kcat.sql(
        "INSERT INTO ksrc VALUES (1, 'a', 11), (2, 'a', 21), (3, 'b', 6)"
    )
    audit = kcat.refresh_materialized_view("rgate_mv")
    assert audit["mode"] == "full"
    got = {
        (r.id, r.grp, r.v2)
        for r in kcat.read_table("rgate_mv").collect()
    }
    exp = {(r.id, r.grp, r.v2) for r in kcat.sql(RW_SQL).collect()}
    assert got == exp


# -- join + GROUP BY MVs: KEYED maintenance under MERGE/DELETE (r10) ---

KJAGG_SQL = (
    "SELECT g, COUNT(*) AS n, SUM(v + w) AS sv, "
    "MIN(v) AS lo, MAX(w) AS hi "
    "FROM ka JOIN kb ON ka.k = kb.k2 "
    "GROUP BY g"
)


def _kjagg_setup(spark, tmp_path):
    """Two MERGE-KEYED MoR sources (the eligibility the keyed join
    path requires: every moved source's window must surface row-level
    in read_changes)."""
    c = Catalog(spark, str(tmp_path / "mvkjagg"))
    c.create_table(
        "ka",
        schema=Schema(
            [
                Field("k", T.LongType(), merge_key=True, nullable=False),
                Field("g", T.StringType()),
                Field("v", T.LongType()),
            ]
        ),
        properties={"read_optimization": "none"},
    )
    c.create_table(
        "kb",
        schema=Schema(
            [
                Field("k2", T.LongType(), merge_key=True, nullable=False),
                Field("w", T.LongType()),
            ]
        ),
        properties={"read_optimization": "none"},
    )
    c.sql("INSERT INTO ka VALUES (1, 'x', 10), (2, 'x', 20), (3, 'y', 5)")
    c.sql("INSERT INTO kb VALUES (1, 100), (2, 200), (3, 7)")
    return c


def _kjagg_rows(c):
    return {
        (r.g, r.n, r.sv, r.lo, r.hi)
        for r in c.read_table("kjagg_mv").collect()
    }


def _kjagg_expected(c):
    return {
        (r.g, r.n, r.sv, r.lo, r.hi) for r in c.sql(KJAGG_SQL).collect()
    }


@pytest.mark.slow
def test_join_agg_keyed_mv_merge_delete_windows(spark, tmp_path):
    """MERGE and DELETE windows on either source of a join-agg MV must
    take the keyed touched-group path (`_mv_join_keyed_refresh`) and
    stay exactly equal to the full recompute — including a MIN/MAX
    decrease (pure retraction arithmetic cannot do that) and a group
    that vanishes entirely."""
    c = _kjagg_setup(spark, tmp_path)
    c.create_materialized_view("kjagg_mv", KJAGG_SQL)
    c.alter_table("kjagg_mv", properties={"mv.keyed_gate": "100"})
    # fact-side upsert: moves k=2 out of group x into group z AND
    # drops the MAX contributor of x
    c.sql("INSERT INTO ka VALUES (2, 'z', 21)")
    audit = c.refresh_materialized_view("kjagg_mv")
    assert audit["mode"] == "incremental_join_agg_keyed", audit
    assert _kjagg_rows(c) == _kjagg_expected(c)
    # dim-side upsert: w change reflows SUM/MAX through the join
    c.sql("INSERT INTO kb VALUES (1, 50)")
    audit = c.refresh_materialized_view("kjagg_mv")
    assert audit["mode"] == "incremental_join_agg_keyed", audit
    assert _kjagg_rows(c) == _kjagg_expected(c)
    # delete the only row of group y -> the group must VANISH from the MV
    c.sql("DELETE FROM ka WHERE k = 3")
    audit = c.refresh_materialized_view("kjagg_mv")
    assert audit["mode"] == "incremental_join_agg_keyed", audit
    assert audit["touched_groups"] >= 1
    assert _kjagg_rows(c) == _kjagg_expected(c)
    assert "y" not in {g for (g, *_rest) in _kjagg_rows(c)}
    # both sides move in ONE window
    c.sql("INSERT INTO ka VALUES (4, 'x', 9)")
    c.sql("INSERT INTO kb VALUES (4, 40), (2, 250)")
    audit = c.refresh_materialized_view("kjagg_mv")
    assert audit["mode"] == "incremental_join_agg_keyed", audit
    assert _kjagg_rows(c) == _kjagg_expected(c)
    assert c.refresh_materialized_view("kjagg_mv")["mode"] == "noop"


@pytest.mark.slow
def test_join_agg_keyed_mv_model_random(spark, tmp_path):
    """Random MERGE/DELETE walk over BOTH keyed sources (group moves,
    NULL groups, vanishing groups, no-op steps): every refresh must
    take the keyed path (or noop) and equal the full recompute."""
    import random

    rng = random.Random(2710)
    c = _kjagg_setup(spark, tmp_path)
    c.create_materialized_view("kjagg_mv", KJAGG_SQL)
    c.alter_table("kjagg_mv", properties={"mv.keyed_gate": "1000"})
    groups = ["x", "y", "z", None]
    for step in range(12):
        moved = False
        if rng.random() < 0.7:
            k = rng.randint(1, 8)
            g = rng.choice(groups)
            gl = "CAST(NULL AS STRING)" if g is None else f"'{g}'"
            c.sql(f"INSERT INTO ka VALUES ({k}, {gl}, {rng.randint(0, 90)})")
            moved = True
        if rng.random() < 0.5:
            c.sql(
                f"INSERT INTO kb VALUES "
                f"({rng.randint(1, 8)}, {rng.randint(0, 900)})"
            )
            moved = True
        if rng.random() < 0.25:
            c.sql(f"DELETE FROM ka WHERE k = {rng.randint(1, 8)}")
            moved = True
        audit = c.refresh_materialized_view("kjagg_mv")
        expect = "incremental_join_agg_keyed" if moved else "noop"
        assert audit["mode"] == expect, f"step {step}: {audit}"
        assert _kjagg_rows(c) == _kjagg_expected(c), f"step {step}"


def test_join_agg_keyed_mv_cost_gate_rebuilds(spark, tmp_path):
    """Default gate (0.5): a window touching every group routes to the
    exact rebuild — the keyed recompute would scan ~everything anyway."""
    c = _kjagg_setup(spark, tmp_path)
    c.create_materialized_view("kjagg_mv", KJAGG_SQL)
    c.sql("INSERT INTO ka VALUES (1, 'x', 11), (3, 'y', 6)")  # all groups
    audit = c.refresh_materialized_view("kjagg_mv")
    assert audit["mode"] == "rebuild", audit
    assert _kjagg_rows(c) == _kjagg_expected(c)
    # and the keyed path resumes on a narrow window
    c.alter_table("kjagg_mv", properties={"mv.keyed_gate": "100"})
    c.sql("INSERT INTO kb VALUES (3, 8)")
    audit = c.refresh_materialized_view("kjagg_mv")
    assert audit["mode"] == "incremental_join_agg_keyed", audit
    assert _kjagg_rows(c) == _kjagg_expected(c)
