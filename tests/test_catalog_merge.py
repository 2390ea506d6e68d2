"""F2/F3 golden tests: MERGE last-writer-wins, DELETE (incl. null
delete-column matching), partial upsert, schema evolution during merge,
CoW/MoR equivalence (FIXTURES.md F2/F3)."""

import pytest
from pyspark.sql import types as T

from deltacat_spark.catalog import Catalog
from deltacat_spark.schema import Field, Schema, SchemaError

USERS_MERGE = Schema(
    [
        Field("id", T.LongType(), merge_key=True),
        Field("name", T.StringType()),
        Field("age", T.IntegerType()),
        Field("city", T.StringType()),
    ]
)


def rows(spark, data):
    return spark.createDataFrame(data, "id long, name string, age int, city string")


@pytest.fixture(params=["max", "none"], ids=["cow", "mor"])
def merge_catalog(request, spark, tmp_path):
    c = Catalog(spark, str(tmp_path / f"cat_{request.param}"))
    c.create_table(
        "um",
        schema=USERS_MERGE,
        properties={"read_optimization": request.param},
    )
    return c


def read_map(catalog):
    return {r.id: r for r in catalog.read_table("um").collect()}


def test_upsert_last_writer_wins(spark, merge_catalog):
    c = merge_catalog
    c.write_to_table(rows(spark, [(1, "a", 10, "x"), (2, "b", 20, "y")]), "um", mode="merge")
    c.write_to_table(rows(spark, [(2, "B", 21, "y2"), (3, "c", 30, "z")]), "um", mode="merge")
    m = read_map(c)
    assert set(m) == {1, 2, 3}
    assert m[2].name == "B" and m[2].age == 21


def test_within_batch_dedupe(spark, merge_catalog):
    c = merge_catalog
    c.write_to_table(
        rows(spark, [(1, "first", 1, "x"), (1, "last", 2, "x")]), "um", mode="merge"
    )
    m = read_map(c)
    assert len(m) == 1 and m[1].name == "last"


def test_delete_then_upsert_restores(spark, merge_catalog):
    c = merge_catalog
    c.write_to_table(rows(spark, [(1, "a", 10, "x"), (2, "b", 20, "y")]), "um", mode="merge")
    deletes = spark.createDataFrame([(1,)], "id long")
    c.write_to_table(deletes, "um", mode="delete")
    assert set(read_map(c)) == {2}
    c.write_to_table(rows(spark, [(1, "re", 11, "x")]), "um", mode="merge")
    m = read_map(c)
    assert set(m) == {1, 2} and m[1].name == "re"


def test_delete_on_non_key_column_null_safe(spark, merge_catalog):
    c = merge_catalog
    if c.snapshot("um", "default").properties.get("read_optimization") == "none":
        pytest.skip("MoR delete payload is key-based; non-key deletes are CoW")
    c.write_to_table(
        rows(spark, [(1, "a", 10, None), (2, "b", 20, "y")]), "um", mode="merge"
    )
    deletes = spark.createDataFrame([(None,)], "city string")
    c.write_to_table(deletes, "um", mode="delete")
    # null city row deleted — null == null matches (reference
    # delete_strategy_equality_delete.py:52-113)
    assert set(read_map(c)) == {2}


def test_merge_requires_merge_keys(spark, catalog):
    df = rows(spark, [(1, "a", 10, "x")])
    catalog.write_to_table(df, "plain", mode="auto")
    with pytest.raises(SchemaError):
        catalog.write_to_table(df, "plain", mode="merge")


def test_partial_upsert_fills_missing_columns(spark, merge_catalog):
    c = merge_catalog
    if c.snapshot("um").properties.get("read_optimization") == "none":
        pytest.skip("partial upsert resolves at write (CoW) in v1")
    c.write_to_table(rows(spark, [(1, "a", 10, "x"), (2, "b", 20, "y")]), "um", mode="merge")
    partial = spark.createDataFrame([(1, 99), (5, 50)], "id long, age int")
    c.write_to_table(partial, "um", mode="merge")
    m = read_map(c)
    assert m[1].age == 99 and m[1].name == "a" and m[1].city == "x"
    assert m[5].age == 50 and m[5].name is None
    assert m[2].age == 20


def test_schema_evolution_new_column_and_promotion(spark, merge_catalog):
    c = merge_catalog
    c.write_to_table(rows(spark, [(1, "a", 10, "x")]), "um", mode="merge")
    evolved = spark.createDataFrame(
        [(2, "b", 20, "y", 0.5)], "id long, name string, age long, city string, score double"
    )
    c.write_to_table(evolved, "um", mode="merge")
    out = c.read_table("um")
    assert dict(out.dtypes)["age"] == "bigint"  # int32 → int64 promotion
    m = {r.id: r for r in out.collect()}
    assert m[1].score is None  # old rows read with null default
    assert m[2].score == 0.5


def test_cow_mor_equivalence(spark, tmp_path):
    """Same write sequence → identical table under CoW and MoR."""
    results = []
    for ro in ("max", "none"):
        c = Catalog(spark, str(tmp_path / f"eq_{ro}"))
        c.create_table("um", schema=USERS_MERGE, properties={"read_optimization": ro})
        c.write_to_table(rows(spark, [(i, f"u{i}", i, "x") for i in range(1, 6)]), "um", mode="merge")
        c.write_to_table(rows(spark, [(i, f"U{i}", i + 100, "y") for i in range(3, 8)]), "um", mode="merge")
        c.write_to_table(spark.createDataFrame([(4,), (6,)], "id long"), "um", mode="delete")
        c.write_to_table(rows(spark, [(6, "back", 6, "z")]), "um", mode="merge")
        results.append(
            sorted(tuple(r) for r in c.read_table("um").collect())
        )
    assert results[0] == results[1]


def test_mor_optimize_compacts_to_same_result(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "opt"))
    c.create_table("um", schema=USERS_MERGE, properties={"read_optimization": "none"})
    c.write_to_table(rows(spark, [(i, f"u{i}", i, "x") for i in range(5)]), "um", mode="merge")
    c.write_to_table(rows(spark, [(2, "two", 2, "y")]), "um", mode="merge")
    c.write_to_table(spark.createDataFrame([(0,)], "id long"), "um", mode="delete")
    before = sorted(tuple(r) for r in c.read_table("um").collect())
    c.optimize_table("um")
    after = sorted(tuple(r) for r in c.read_table("um").collect())
    assert before == after
    # compacted: no unresolved deltas remain
    assert all(f.delta_type is None for f in c.snapshot("um").files)
    # vacuum drops only unreferenced files (e.g. empty part files never
    # recorded in the log) — reads at current AND old versions survive
    c.vacuum("um", min_age_seconds=0)
    assert sorted(tuple(r) for r in c.read_table("um").collect()) == after
    assert c.read_table("um", version_as_of=2).count() == 5


def test_dedupe_agg_ascending_string_order(spark):
    from deltacat_spark.operators.merge import (
        dedupe_last_writer,
        dedupe_last_writer_agg,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "b", 10.0), (1, "a", 20.0), (2, "z", 5.0), (2, "z", 5.0)],
        "id long, tag string, x double",
    )
    # ascending on a STRING order column (the negation trick would fail
    # at analysis); winner = lexicographically smallest tag
    got = dedupe_last_writer_agg(
        df, ["id"], ["tag"], descending=False
    ).orderBy("id")
    want = dedupe_last_writer(
        df, ["id"], [F.asc("tag"), F.asc("x")]
    ).orderBy("id")
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_mor_partial_upsert_survives_optimize(spark, tmp_path):
    """OPTIMIZE folds MoR deltas through the same resolver — stitched
    partial-upsert values must survive compaction, and the non-key
    delete must stay applied."""
    from deltacat_spark.catalog import Catalog

    c = Catalog(spark, str(tmp_path / "mopt"))
    c.create_table(
        "t", schema=USERS_MERGE, properties={"read_optimization": "none"}
    )
    c.write_to_table(
        rows(spark, [(1, "a", 10, "x"), (2, "b", 20, "y"), (3, "c", 30, "z")]),
        "t",
        mode="merge",
    )
    # partial: only age for id=1
    c.write_to_table(
        spark.createDataFrame([(1, 99)], "id long, age int"), "t", mode="merge"
    )
    # non-key delete: city == 'y'
    c.write_to_table(
        spark.createDataFrame([("y",)], "city string"), "t", mode="delete"
    )
    expect = {(1, "a", 99, "x"), (3, "c", 30, "z")}
    got = {(r.id, r.name, r.age, r.city) for r in c.read_table("t").collect()}
    assert got == expect
    c.optimize_table("t")
    got = {(r.id, r.name, r.age, r.city) for r in c.read_table("t").collect()}
    assert got == expect
    # post-compaction writes still behave
    c.write_to_table(
        spark.createDataFrame([(3, 31)], "id long, age int"), "t", mode="merge"
    )
    got = {(r.id, r.name, r.age, r.city) for r in c.read_table("t").collect()}
    assert got == {(1, "a", 99, "x"), (3, "c", 31, "z")}


def test_mor_nonkey_delete_then_reinsert(spark, tmp_path):
    from deltacat_spark.catalog import Catalog

    c = Catalog(spark, str(tmp_path / "mdel"))
    c.create_table(
        "t", schema=USERS_MERGE, properties={"read_optimization": "none"}
    )
    c.write_to_table(rows(spark, [(1, "a", 7, "x")]), "t", mode="merge")
    c.write_to_table(
        spark.createDataFrame([(7,)], "age int"), "t", mode="delete"
    )
    assert c.read_table("t").count() == 0
    # re-insert with the SAME matching value at a later version: survives
    c.write_to_table(rows(spark, [(1, "a2", 7, "x")]), "t", mode="merge")
    got = {(r.id, r.name, r.age) for r in c.read_table("t").collect()}
    assert got == {(1, "a2", 7)}


def test_mor_partial_upsert_with_evolution(spark, tmp_path):
    """A partial delta that also EVOLVES the schema (new column):
    stitching must fill the new column for its key and leave other
    keys' new column null."""
    from deltacat_spark.catalog import Catalog

    c = Catalog(spark, str(tmp_path / "mevo"))
    c.create_table(
        "t", schema=USERS_MERGE, properties={"read_optimization": "none"}
    )
    c.write_to_table(
        rows(spark, [(1, "a", 10, "x"), (2, "b", 20, "y")]), "t", mode="merge"
    )
    c.write_to_table(
        spark.createDataFrame([(1, "DE")], "id long, country string"),
        "t",
        mode="merge",
    )
    got = {
        (r.id, r.name, r.age, r.city, r.country)
        for r in c.read_table("t").collect()
    }
    assert got == {(1, "a", 10, "x", "DE"), (2, "b", 20, "y", None)}


def test_cow_partial_upsert_with_evolution(spark, tmp_path):
    """CoW twin of the MoR evolution case: a partial batch that also
    adds a new column fills it for its key, leaves others null, and
    keeps the untouched columns."""
    from deltacat_spark.catalog import Catalog

    c = Catalog(spark, str(tmp_path / "cevo"))
    c.create_table(
        "t", schema=USERS_MERGE, properties={"read_optimization": "max"}
    )
    c.write_to_table(
        rows(spark, [(1, "a", 10, "x"), (2, "b", 20, "y")]), "t", mode="merge"
    )
    c.write_to_table(
        spark.createDataFrame([(1, "DE")], "id long, country string"),
        "t",
        mode="merge",
    )
    got = {
        (r.id, r.name, r.age, r.city, r.country)
        for r in c.read_table("t").collect()
    }
    assert got == {(1, "a", 10, "x", "DE"), (2, "b", 20, "y", None)}


def test_mor_partial_stitching_under_time_travel(spark, tmp_path):
    """Each historical version resolves its OWN stitched state: the
    partial-delta chain replays correctly at every as-of point."""
    from deltacat_spark.catalog import Catalog

    c = Catalog(spark, str(tmp_path / "tt"))
    c.create_table(
        "t", schema=USERS_MERGE, properties={"read_optimization": "none"}
    )
    c.write_to_table(rows(spark, [(1, "a", 10, "x")]), "t", mode="merge")
    v_full = c.snapshot("t").version
    c.write_to_table(
        spark.createDataFrame([(1, 99)], "id long, age int"), "t", mode="merge"
    )
    v_partial = c.snapshot("t").version
    c.write_to_table(
        spark.createDataFrame([(1, "z")], "id long, name string"),
        "t",
        mode="merge",
    )
    pick = lambda df: [(r.id, r.name, r.age) for r in df.collect()]
    assert pick(c.read_table("t")) == [(1, "z", 99)]
    assert pick(c.read_table("t", version_as_of=v_partial)) == [(1, "a", 99)]
    assert pick(c.read_table("t", version_as_of=v_full)) == [(1, "a", 10)]
