"""`read_as` local-table variants (reference LocalTable types,
`types/media.py:123-158`) + chunked `from_manifest_table` reads."""

import numpy as np
import pytest

from deltacat_spark.schema import Field, Schema
from pyspark.sql import types as T

SCHEMA = Schema(
    [Field("id", T.LongType()), Field("name", T.StringType())]
)


@pytest.fixture()
def table(spark, catalog):
    catalog.create_table("t", schema=SCHEMA)
    catalog.write_to_table(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
        ),
        "t",
        mode="append",
    )
    return catalog


def test_read_as_pandas(table):
    pdf = table.read_table("t", read_as="pandas")
    assert sorted(pdf["id"]) == [1, 2, 3]


def test_read_as_arrow(table):
    tbl = table.read_table("t", read_as="arrow")
    assert sorted(tbl.column("id").to_pylist()) == [1, 2, 3]


def test_read_as_numpy(table):
    arrs = table.read_table("t", read_as="numpy")
    assert set(arrs) == {"id", "name"}
    assert isinstance(arrs["id"], np.ndarray)
    assert sorted(arrs["id"].tolist()) == [1, 2, 3]


def test_read_as_polars(table):
    pl = pytest.importorskip("polars")
    out = table.read_table("t", read_as="polars")
    assert isinstance(out, pl.DataFrame)
    assert sorted(out["id"].to_list()) == [1, 2, 3]


def test_read_as_unknown_rejected(table):
    with pytest.raises(ValueError, match="read_as"):
        table.read_table("t", read_as="ray")


def test_from_manifest_table_chunked(spark, catalog, tmp_path):
    paths = []
    for i in range(5):
        p = tmp_path / f"blob{i}.bin"
        p.write_bytes(b"payload-%d" % i)
        paths.append(str(p))
    catalog.put_files(paths, "blobs")
    manifest = catalog.read_table("blobs")
    # batch_size smaller than the file count forces the multi-chunk path
    df = catalog.from_manifest_table(manifest, batch_size=2)
    rows = df.collect()
    assert len(rows) == 5
    assert sorted(bytes(r.content) for r in rows) == [
        b"payload-%d" % i for i in range(5)
    ]


def test_from_manifest_table_empty(spark, catalog):
    manifest = spark.createDataFrame([], "path string, record_count long")
    df = catalog.from_manifest_table(manifest)
    assert df.count() == 0
