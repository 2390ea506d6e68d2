"""Top-level dc-style API surface test (reference
`deltacat/__init__.py:5-115` exports)."""

from deltacat_spark import api as dc


def test_dc_surface(spark, tmp_path):
    dc.init(str(tmp_path / "cat"), spark)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    dc.write(df, "t")
    assert dc.read("t").count() == 2
    assert dc.list_tables() == ["t"]
    assert dc.table_exists("t")
    dc.rename_table("t", "t2")
    assert dc.read("t2").count() == 2
    dc.truncate_table("t2")
    assert dc.read("t2").count() == 0
    dc.drop_table("t2")
    assert not dc.table_exists("t2")

    url = str(tmp_path / "d.parquet")
    dc.put(df, url)
    assert dc.get(url).count() == 2
    dc.copy(url, str(tmp_path / "d_csv"), dst_fmt="csv")
    assert dc.get(str(tmp_path / "d_csv"), fmt="csv").count() == 2
    assert any(e["path"].endswith("d.parquet") for e in dc.list(str(tmp_path)))


def test_dc_restore_history_transaction(spark, tmp_path):
    dc.init(str(tmp_path / "cat2"), spark)
    df1 = spark.createDataFrame([(1,)], "id long")
    dc.write(df1, "r")
    v1 = dc.catalog().snapshot("r").version
    dc.write(spark.createDataFrame([(2,)], "id long"), "r", mode="append")
    v = dc.restore_table("r", version=v1)
    assert dc.read("r").count() == 1
    hist = dc.history("r")
    assert hist[0]["version"] == v and hist[0]["operation"] == "RESTORE"
    with dc.transaction() as txn:
        txn.write(spark.createDataFrame([(9,)], "id long"), "r", mode="append")
    assert dc.read("r").count() == 2


def test_dc_maintenance_and_txn_replay(spark, tmp_path):
    dc.init(str(tmp_path / "cat3"), spark)
    df = spark.createDataFrame([(i,) for i in range(6)], "id long")
    dc.write(df, "m")
    with dc.transaction() as txn:
        txn.write(spark.createDataFrame([(99,)], "id long"), "m", mode="append")
    states = dc.read_transaction(txn.txn_id)
    assert states["default.m"].count() == 7
    dc.optimize_table("m")
    rep = dc.vacuum("m", min_age_seconds=0, retain_versions=0, dry_run=True)
    assert rep.dry_run and rep == len(rep.files)
    assert dc.read("m").count() == 7


def test_dc_sql_bridge(spark, tmp_path):
    dc.init(str(tmp_path / "cat4"), spark)
    dc.write(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id long, g string"),
        "s1",
    )
    dc.write(spark.createDataFrame([(1, 10), (3, 30)], "id long, w int"), "s2")
    out = dc.sql(
        "SELECT g, SUM(w) AS tw FROM s1 JOIN s2 USING (id) GROUP BY g ORDER BY g"
    ).collect()
    assert [(r.g, r.tw) for r in out] == [("a", 40)]
    # time-travelled view
    v0 = dc.catalog().snapshot("s1").version
    dc.write(spark.createDataFrame([(9, "z")], "id long, g string"), "s1", mode="append")
    dc.catalog().register_view("s1", view_name="s1_old", version_as_of=v0)
    assert dc.catalog().spark.sql("SELECT count(*) c FROM s1_old").collect()[0].c == 3
