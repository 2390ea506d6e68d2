"""Round-9 ADVICE fixes.

1. NULL-group incremental-aggregate MV refresh: the partial-to-old join
   and the downstream merge upsert are null-safe, so a GROUP BY over a
   nullable column combines the NULL group instead of duplicating it
   (`catalog/materialize.py:_merge_partial_into_old`,
   `operators/merge.py:upsert`).
2. Generated columns reject partial payloads carrying a strict subset of
   an expression's source columns (`catalog.py:_apply_generated_columns`).
3. Streaming MV bootstrap stamps the watermark on the bootstrap data
   commit itself, not a follow-up ALTER (`materialize.py:_sink`).
4. `weighted_sample_topk` fails loudly on NULL/zero/negative weights
   (`operators/sampling.py`).
5. MV refresh SQL substitution only rewrites TABLE-REFERENCE positions —
   columns/aliases spelled like a source table survive
   (`catalog.py:_substitute_table_refs`).
"""

import pytest
from pyspark.sql import functions as F

from deltacat_spark.catalog.catalog import (
    _substitute_table_refs,
    _table_ref_spans,
    _strip_literals,
)
from deltacat_spark.catalog.materialize import (
    MV_SRC_VERSION,
    parse_agg_view,
    refresh_incremental,
)
from deltacat_spark.operators.merge import upsert
from deltacat_spark.schema import Field, Schema, SchemaError
import pyspark.sql.types as T


# -- 1. NULL-group MV refresh -----------------------------------------


def test_incremental_agg_mv_combines_null_group(spark, catalog):
    catalog.create_namespace("default")
    src = spark.createDataFrame([(None, 5), ("a", 1)], "g string, v int")
    catalog.create_table("t", "default")
    catalog.write_to_table(src, "t", "default", mode="append")
    sql = "SELECT g, SUM(v) AS sv FROM t GROUP BY g"
    spec = parse_agg_view(sql)
    assert spec is not None
    tr = lambda df: df.groupBy("g").agg(F.sum("v").alias("sv"))
    r = refresh_incremental(
        catalog, "t", "mv", tr, record_wise=False, agg_spec=spec
    )
    assert r["mode"] == "full"
    catalog.write_to_table(
        spark.createDataFrame([(None, 10), ("a", 2)], "g string, v int"),
        "t",
        "default",
        mode="append",
    )
    r = refresh_incremental(
        catalog, "t", "mv", tr, record_wise=False, agg_spec=spec
    )
    assert r["mode"] == "incremental_agg"
    got = {r_.g: r_.sv for r_ in catalog.read_table("mv", "default").collect()}
    assert got == {None: 15, "a": 3}
    # oracle: the incremental result equals the full-recompute answer
    oracle = {
        r_.g: r_.sv
        for r_ in tr(catalog.read_table("t", "default")).collect()
    }
    assert got == oracle


def test_upsert_operator_null_safe_on_keys(spark):
    existing = spark.createDataFrame(
        [(None, "old"), ("k", "keep")], "id string, v string"
    )
    updates = spark.createDataFrame([(None, "new")], "id string, v string")
    got = {r.id: r.v for r in upsert(existing, updates, ["id"]).collect()}
    assert got == {None: "new", "k": "keep"}
    # broadcast path identical
    got_b = {
        r.id: r.v
        for r in upsert(
            existing, updates, ["id"], broadcast_updates=True
        ).collect()
    }
    assert got_b == got


def test_null_key_merge_through_catalog(spark, catalog):
    """End-to-end: a catalog MERGE with a NULL merge-key row replaces the
    stored NULL-key row (null-safe), never duplicates it — including the
    copy-by-reference stats split (`_payload_bounds` NULL-awareness)."""
    catalog.create_namespace("default")
    df0 = spark.createDataFrame(
        [(None, 1), ("x", 1), ("far", 1)], "id string, v int"
    )
    fields = [
        Field("id", T.StringType(), merge_key=True),
        Field("v", T.IntegerType()),
    ]
    catalog.create_table("nk", "default", schema=Schema(fields))
    catalog.write_to_table(df0, "nk", "default", mode="merge")
    upd = spark.createDataFrame([(None, 99)], "id string, v int")
    catalog.write_to_table(upd, "nk", "default", mode="merge")
    rows = sorted(
        ((r.id, r.v) for r in catalog.read_table("nk", "default").collect()),
        key=lambda t: (t[0] is not None, t[0] or ""),
    )
    assert rows == [(None, 99), ("far", 1), ("x", 1)]


# -- 2. generated-column partial-source rejection ---------------------


@pytest.fixture()
def gen_catalog(spark, catalog):
    catalog.create_namespace("default")
    fields = [
        Field("id", T.StringType(), merge_key=True),
        Field("a", T.IntegerType()),
        Field("b", T.IntegerType()),
        Field(
            "s",
            T.IntegerType(),
            generated_expr="a + b",
        ),
    ]
    catalog.create_table("g", "default", schema=Schema(fields))
    catalog.write_to_table(
        spark.createDataFrame([("k", 10, 100, 110)], "id string, a int, b int, s int"),
        "g",
        "default",
        mode="merge",
    )
    return catalog


def test_generated_rejects_partial_source_subset(spark, gen_catalog):
    partial = spark.createDataFrame([("k", 20)], "id string, a int")
    with pytest.raises(SchemaError, match="full source"):
        gen_catalog.write_to_table(partial, "g", "default", mode="merge")
    # stored row untouched
    row = gen_catalog.read_table("g", "default").collect()[0]
    assert (row.a, row.b, row.s) == (10, 100, 110)


def test_generated_rejects_value_without_sources(spark, gen_catalog):
    payload = spark.createDataFrame([("k", 999)], "id string, s int")
    with pytest.raises(SchemaError, match="full source"):
        gen_catalog.write_to_table(payload, "g", "default", mode="merge")


def test_generated_full_source_partial_payload_ok(spark, gen_catalog):
    """Carrying EVERY source column (but not other columns) recomputes
    the generated value in the stitched row."""
    fields = [
        Field("id", T.StringType(), merge_key=True),
        Field("a", T.IntegerType()),
        Field("b", T.IntegerType()),
        Field("extra", T.StringType()),
        Field("s", T.IntegerType(), generated_expr="a + b"),
    ]
    gen_catalog.create_table("g2", "default", schema=Schema(fields))
    gen_catalog.write_to_table(
        spark.createDataFrame(
            [("k", 1, 2, "e", 3)],
            "id string, a int, b int, extra string, s int",
        ),
        "g2",
        "default",
        mode="merge",
    )
    partial = spark.createDataFrame([("k", 7, 8)], "id string, a int, b int")
    gen_catalog.write_to_table(partial, "g2", "default", mode="merge")
    row = gen_catalog.read_table("g2", "default").collect()[0]
    assert (row.a, row.b, row.s, row.extra) == (7, 8, 15, "e")


def test_generated_absent_sources_partial_ok(spark, gen_catalog):
    """A partial payload touching NEITHER the generated column nor any
    source stays allowed — stored value and stored sources both survive
    the stitch, still consistent."""
    fields = [
        Field("id", T.StringType(), merge_key=True),
        Field("a", T.IntegerType()),
        Field("b", T.IntegerType()),
        Field("other", T.StringType()),
        Field("s", T.IntegerType(), generated_expr="a + b"),
    ]
    gen_catalog.create_table("g3", "default", schema=Schema(fields))
    gen_catalog.write_to_table(
        spark.createDataFrame(
            [("k", 1, 2, "x", 3)],
            "id string, a int, b int, other string, s int",
        ),
        "g3",
        "default",
        mode="merge",
    )
    partial = spark.createDataFrame([("k", "y")], "id string, other string")
    gen_catalog.write_to_table(partial, "g3", "default", mode="merge")
    row = gen_catalog.read_table("g3", "default").collect()[0]
    assert (row.a, row.b, row.s, row.other) == (1, 2, 3, "y")


def test_expr_source_cols_ignores_function_names():
    from deltacat_spark.catalog.catalog import Catalog

    # a column named `year` used as a function is not a source ref
    got = Catalog._expr_source_cols("year(ts)", ["year", "ts"])
    assert got == {"ts"}
    got = Catalog._expr_source_cols("`a` + b * 2", ["a", "b", "c"])
    assert got == {"a", "b"}


# -- 4. weighted sample weight guard ----------------------------------


def test_weighted_sample_topk_rejects_bad_weights(spark):
    from deltacat_spark.operators.sampling import weighted_sample_topk

    for bad in [0.0, -1.5, None]:
        df = spark.createDataFrame(
            [("a", 1.0), ("b", bad)], "id string, w double"
        )
        with pytest.raises(ValueError, match="strictly positive"):
            weighted_sample_topk(df, "id", "w", k=1)
    ok = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "id string, w double"
    )
    assert weighted_sample_topk(ok, "id", "w", k=2).count() == 2


# -- 5. table-reference-position substitution -------------------------


def test_substitute_table_refs_skips_columns_and_aliases():
    sql = "SELECT o.orders, orders FROM orders o WHERE o.orders > 1"
    out = _substitute_table_refs(sql, "orders", "PIN")
    assert out == "SELECT o.orders, orders FROM PIN o WHERE o.orders > 1"


def test_substitute_table_refs_join_and_comma_list():
    sql = (
        "SELECT * FROM orders, customer c "
        "JOIN orders ON c.k = orders.k "
        "LEFT OUTER JOIN customer ON 1=1"
    )
    out = _substitute_table_refs(sql, "orders", "P1")
    out = _substitute_table_refs(out, "customer", "P2")
    # unaliased refs get re-aliased to the ORIGINAL name so bare-name
    # qualifiers (orders.k) keep resolving against the substitute
    assert "FROM P1 AS orders, P2 c" in out
    assert "JOIN P1 AS orders ON" in out
    assert "LEFT OUTER JOIN P2 AS customer ON" in out
    assert "orders.k" in out


def test_substitute_table_refs_literal_untouched():
    sql = "SELECT 'orders' AS lbl FROM orders"
    out = _substitute_table_refs(sql, "orders", "PIN")
    assert out == "SELECT 'orders' AS lbl FROM PIN AS orders"


def test_table_ref_spans_subquery():
    sql = "SELECT * FROM (SELECT x FROM orders) t, orders"
    stripped = _strip_literals(sql)
    spans = _table_ref_spans(stripped, "orders")
    assert [sql[s:e] for s, e, _a in spans] == ["orders", "orders"]
    assert [a for _s, _e, a in spans] == [False, False]
    out = _substitute_table_refs(sql, "orders", "PIN")
    assert out == (
        "SELECT * FROM (SELECT x FROM PIN AS orders) t, PIN AS orders"
    )


def test_mv_multi_with_tablename_column_alias(spark, catalog):
    """End-to-end: a multi-table MV whose SQL aliases a column to a
    source table's name refreshes correctly (the old blind rewrite
    produced unparseable SQL)."""
    catalog.create_namespace("default")
    catalog.create_table("orders9", "default")
    catalog.create_table("cust9", "default")
    catalog.write_to_table(
        spark.createDataFrame([(1, 10), (2, 20)], "ck int, amt int"),
        "orders9",
        "default",
        mode="append",
    )
    catalog.write_to_table(
        spark.createDataFrame([(1, "x"), (2, "y")], "ck int, nm string"),
        "cust9",
        "default",
        mode="append",
    )
    sql = (
        "SELECT c.nm AS cust9, o.amt AS orders9 "
        "FROM orders9 o JOIN cust9 c ON o.ck = c.ck"
    )
    catalog.create_materialized_view("mv9", sql)
    got = sorted(
        (r.cust9, r.orders9)
        for r in catalog.read_table("mv9", "default").collect()
    )
    assert got == [("x", 10), ("y", 20)]


# -- 3. streaming MV bootstrap atomicity ------------------------------


def test_stream_mv_bootstrap_watermark_rides_data_commit(
    spark, catalog, tmp_path
):
    from deltacat_spark.catalog.materialize import stream_refresh_incremental

    catalog.create_namespace("default")
    catalog.create_table("s9", "default")
    catalog.write_to_table(
        spark.createDataFrame([("g1", 5)], "g string, v int"),
        "s9",
        "default",
        mode="append",
    )
    sql = "SELECT g, SUM(v) AS sv FROM s9 GROUP BY g"
    spec = parse_agg_view(sql)
    q = stream_refresh_incremental(
        catalog,
        "s9",
        "smv9",
        lambda df: df.groupBy("g").agg(F.sum("v").alias("sv")),
        checkpoint_dir=str(tmp_path / "ckpt"),
        agg_spec=spec,
    )
    q.awaitTermination(120)
    assert {r.g: r.sv for r in catalog.read_table("smv9", "default").collect()} == {
        "g1": 5
    }
    # the watermark must ride the bootstrap DATA commit: the last commit
    # in the MV's history carries both data actions and the property —
    # no trailing ALTER-only commit
    hist = catalog.history("smv9", "default")
    last = max(hist, key=lambda h: h["version"])
    assert last["operation"] != "ALTER"
    assert last["n_adds"] > 0
    props = catalog.snapshot("smv9", "default").properties
    assert props.get(MV_SRC_VERSION) is not None


# -- connected-components driver-bound dispatch guard ------------------


def test_cc_driver_bound_dispatch(spark, monkeypatch):
    """`driver_max_edges` guards the driver union-find fast path: under
    the bound the driver path runs (streamed, never a full collect);
    over it the distributed propagation produces identical labels —
    the dispatch the in-code byte math justifies."""
    import deltacat_spark.operators.dedupe as dd

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    expected = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    called = {}
    orig = dd._cc_driver_union_find

    def spy(edges):
        called["driver"] = True
        return orig(edges)

    monkeypatch.setattr(dd, "_cc_driver_union_find", spy)
    out = {
        (r.doc_id, r.cluster_id)
        for r in dd.connected_components(pairs, driver_max_edges=100).collect()
    }
    assert called.get("driver") and out == expected

    def boom(edges):
        raise AssertionError("driver path must not run above the bound")

    monkeypatch.setattr(dd, "_cc_driver_union_find", boom)
    out2 = {
        (r.doc_id, r.cluster_id)
        for r in dd.connected_components(pairs, driver_max_edges=3).collect()
    }
    assert out2 == expected


def test_substitute_table_refs_edge_case_pack():
    """Table-driven edge cases for the table-position substitution
    state machine."""
    cases = [
        # (sql, table, replacement, expected)
        (
            "SELECT a FROM T WHERE x = 'from T'",
            "t",
            "P",
            "SELECT a FROM P AS t WHERE x = 'from T'",
        ),  # mixed case + literal containing a fake ref
        (
            "SELECT t.a FROM `t`",
            "t",
            "P",
            "SELECT t.a FROM P AS t",
        ),  # backquoted reference
        (
            "SELECT * FROM t AS x JOIN t y ON x.a = y.a",
            "t",
            "P",
            "SELECT * FROM P AS x JOIN P y ON x.a = y.a",
        ),  # self-join, AS and bare aliases
        (
            "SELECT * FROM u JOIN t ON u.a = t.a AND t.b > 1",
            "t",
            "P",
            "SELECT * FROM u JOIN P AS t ON u.a = t.a AND t.b > 1",
        ),  # qualifiers inside a multi-term ON stay intact
        (
            "SELECT t FROM u",
            "t",
            "P",
            "SELECT t FROM u",
        ),  # column named like the table, different source
        (
            "SELECT * FROM t TABLESAMPLE (1 PERCENT)",
            "t",
            "P",
            "SELECT * FROM P AS t TABLESAMPLE (1 PERCENT)",
        ),  # postfix clause is not an alias
        (
            "SELECT * FROM (SELECT * FROM t) t2 WHERE t2.t > 0",
            "t",
            "P",
            "SELECT * FROM (SELECT * FROM P AS t) t2 WHERE t2.t > 0",
        ),  # subquery ref replaced; outer qualified column untouched
    ]
    for sql, table, repl, expected in cases:
        assert _substitute_table_refs(sql, table, repl) == expected, sql


# -- footer null_count: IS NULL skipping + NULL-payload overlap --------


def test_null_count_stats_and_isnull_skipping(spark, catalog):
    from deltacat_spark.plans.expr import col

    catalog.create_namespace("default")
    catalog.create_table("ns", "default")
    catalog.write_to_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string"),
        "ns",
        "default",
        mode="append",
    )
    catalog.write_to_table(
        spark.createDataFrame([(3, None), (4, "c")], "id long, val string"),
        "ns",
        "default",
        mode="append",
    )
    catalog.write_to_table(
        spark.createDataFrame(
            [(5, None)], "id long, val string"
        ),  # all-null val
        "ns",
        "default",
        mode="append",
    )
    snap = catalog.snapshot("ns", "default")
    per_file = {
        f.path: (f.stats or {}).get("val", {}).get("nulls")
        for f in snap.files
    }
    assert sum(v for v in per_file.values() if v) == 2
    assert any(v == 0 for v in per_file.values())
    # IS NULL keeps exactly the files that hold (or may hold) a null
    kept = {f.path for f in snap.prune(None, [("val", "isnull", None)])}
    assert kept == {p for p, v in per_file.items() if v is None or v > 0}
    # NOT IS NULL drops exactly the all-null files
    kept = {f.path for f in snap.prune(None, [("val", "notnull", None)])}
    all_null = {
        f.path
        for f in snap.files
        if per_file[f.path] is not None and per_file[f.path] == f.records
    }
    assert all_null and kept == {p for p in per_file} - all_null
    # end-to-end: predicate read returns exactly the NULL rows
    out = catalog.read_table(
        "ns", "default", predicate=col("val").is_null()
    )
    assert sorted(r.id for r in out.collect()) == [3, 5]
    out2 = catalog.read_table(
        "ns", "default", predicate=col("val").is_null().not_()
    )
    assert sorted(r.id for r in out2.collect()) == [1, 2, 4]


def test_null_payload_bounds_prune_nullfree_files(spark, catalog):
    """A NULL-key merge payload can now still prove disjointness against
    files whose footers record ZERO nulls — copy-by-reference keeps
    range-disjoint null-free files live instead of rewriting them."""
    from deltacat_spark.catalog.catalog import Catalog

    catalog.create_namespace("default")
    fields = [
        Field("id", T.StringType(), merge_key=True),
        Field("v", T.IntegerType()),
    ]
    catalog.create_table("nb", "default", schema=Schema(fields))
    # two key ranges in separate files (separate merges — CoW rewrites
    # resolve, so write ranges via two tables? use one merge then check
    # split classification directly on synthetic stats)
    payload = spark.createDataFrame(
        [(None, 9), ("b", 9)], "id string, v int"
    )
    bounds = Catalog._payload_bounds(payload, ["id"])
    lo, hi, has_null = bounds["id"]
    assert (lo, hi, has_null) == ("b", "b", True)
    # null-free disjoint file: provably untouched
    assert not Catalog._stats_overlap(
        {"id": {"min": "x", "max": "z", "nulls": 0}}, bounds
    )
    # disjoint range but nulls present — must stay touched
    assert Catalog._stats_overlap(
        {"id": {"min": "x", "max": "z", "nulls": 1}}, bounds
    )
    # disjoint range, null_count unknown (old file) — stays touched
    assert Catalog._stats_overlap(
        {"id": {"min": "x", "max": "z"}}, bounds
    )
    # overlapping range, null-free — touched via the range
    assert Catalog._stats_overlap(
        {"id": {"min": "a", "max": "c", "nulls": 0}}, bounds
    )
