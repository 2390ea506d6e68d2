"""URL dataset utilities the reference stubs with NotImplementedError
(`api.py:311-491`) — implemented for real here: concat, delete, move,
touch, exists, query (SQL over quoted dataset paths), head, tail."""

import os

from deltacat_spark import api as dc


def _setup(spark, tmp_path):
    dc.init(str(tmp_path / "cat"), spark=spark)
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string").coalesce(
        1
    ).write.parquet(a)
    spark.createDataFrame([(3, "z")], "id long, s string").coalesce(
        1
    ).write.parquet(b)
    return a, b


def test_concat_appends_rows(spark, tmp_path):
    a, b = _setup(spark, tmp_path)
    dc.concat(b, a)
    assert {r.id for r in dc.get(a).collect()} == {1, 2, 3}


def test_delete_move_touch_exists(spark, tmp_path):
    a, b = _setup(spark, tmp_path)
    moved = str(tmp_path / "moved.parquet")
    dc.move(b, moved)
    assert not os.path.exists(b) and dc.exists(moved)
    dc.delete(moved)
    assert not dc.exists(moved)
    marker = str(tmp_path / "sub" / "flag")
    dc.touch(marker)
    assert dc.exists(marker)


def test_query_resolves_quoted_paths(spark, tmp_path):
    a, b = _setup(spark, tmp_path)
    df = dc.query(
        f"SELECT t.id, u.id AS other FROM '{a}' t JOIN '{b}' u ON t.id = u.id - 2"
    )
    assert [(r.id, r.other) for r in df.collect()] == [(1, 3)]


def test_head_tail(spark, tmp_path):
    a, _ = _setup(spark, tmp_path)
    assert len(dc.head(a, 1)) == 1
    assert len(dc.tail(a, 1)) == 1
    assert {r.id for r in dc.head(a, 5)} == {1, 2}
