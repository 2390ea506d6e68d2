"""Format IO + URL API tests (reference readers `utils/pyarrow.py:232-682`,
URL API `api.py:97-480`)."""

import pytest

from deltacat_spark.sources.formats import (
    copy_url,
    infer_format,
    list_url,
    read_url,
    write_url,
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b|x", 2.5), (3, None, None)],
        "id long, s string, v double",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "tsv", "psv"])
def test_roundtrip(spark, tmp_path, sample, fmt):
    url = str(tmp_path / f"data_{fmt}")
    write_url(sample, url, fmt)
    back = read_url(spark, url, fmt)
    assert back.count() == 3
    ids = sorted(r.id for r in back.collect())
    assert ids == [1, 2, 3]


def test_feather_roundtrip(spark, tmp_path, sample):
    url = str(tmp_path / "d.feather")
    write_url(sample, url, "feather")
    back = read_url(spark, url, "feather")
    assert back.count() == 3


def test_copy_between_formats(spark, tmp_path, sample):
    src = str(tmp_path / "src_csv")
    dst = str(tmp_path / "dst_parquet")
    write_url(sample, src, "csv")
    copy_url(spark, src, dst, "csv", "parquet")
    assert read_url(spark, dst, "parquet").count() == 3


def test_infer_and_list(spark, tmp_path, sample):
    assert infer_format("x/y.csv") == "csv"
    assert infer_format("x/y.jsonl") == "json"
    assert infer_format("x/img.png") == "binary"
    url = str(tmp_path / "d.parquet")
    write_url(sample, url, "parquet")
    listing = list_url(spark, str(tmp_path))
    assert any(e["path"].endswith("d.parquet") for e in listing)


def test_compressed_json(spark, tmp_path, sample):
    url = str(tmp_path / "gz_json")
    write_url(sample, url, "json", options={"compression": "gzip"})
    back = read_url(spark, url, "json")
    assert back.count() == 3


def test_kwargs_provider_and_pluggable_io_fns(spark, tmp_path):
    """Reference ReadKwargsProvider / TableWriterFn parity
    (`utils/common.py`, `utils/pyarrow.py:801-888`): per-content-type
    option rewriting + whole-call reader/writer overrides."""
    from deltacat_spark.sources.formats import (
        ContentTypeKwargsProvider,
        read_url,
        register_reader_fn,
        register_writer_fn,
        write_url,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    p = str(tmp_path / "out_csv")
    # provider flips the delimiter for csv only
    prov = ContentTypeKwargsProvider({"csv": {"sep": ";", "header": "true"}})
    write_url(df, p, fmt="csv", kwargs_provider=prov)
    raw = spark.read.text(p).collect()
    assert any(";" in r.value for r in raw)
    back = read_url(spark, p, fmt="csv", kwargs_provider=prov)
    assert sorted((r.id, r.v) for r in back.collect()) == [("1", "a"), ("2", "b")] or \
        sorted((int(r.id), r.v) for r in back.collect()) == [(1, "a"), (2, "b")]
    # pluggable writer/reader fns take over the whole call
    calls = {}

    def my_writer(df_, url, mode, opts):
        calls["w"] = (url, mode, opts)
        df_.write.mode(mode).parquet(url)

    def my_reader(spark_, url, opts):
        calls["r"] = (url, opts)
        return spark_.read.parquet(url)

    register_writer_fn("myfmt", my_writer)
    register_reader_fn("myfmt", my_reader)
    p2 = str(tmp_path / "custom")
    write_url(df, p2, fmt="myfmt", options={"x": 1})
    got = read_url(spark, p2, fmt="myfmt")
    assert sorted((r.id, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]
    assert calls["w"][2] == {"x": 1} and calls["r"][0] == p2


def test_feather_dir_roundtrip_distributed(spark, tmp_path):
    from deltacat_spark.sources.formats import (
        read_feather_dir,
        write_feather_dir,
    )

    df = spark.range(0, 1000, 1, 4).selectExpr(
        "id", "cast(id * 2 as double) AS dbl", "concat('s', id) AS s"
    )
    out = str(tmp_path / "fdir")
    manifest = write_feather_dir(df, out).collect()
    assert sum(r.n_rows for r in manifest) == 1000
    assert len(manifest) == 4  # one part per partition
    back = read_feather_dir(spark, out)
    assert back.schema == df.schema
    assert sorted(r.id for r in back.collect()) == list(range(1000))
    # executor-side decode, not a driver loop
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
