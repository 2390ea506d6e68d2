"""Multi-format readers/writers + the URL-addressable dataset API.

Reference surface: per-content-type readers (`utils/pyarrow.py:232-484`:
CSV/TSV/PSV/unescaped-TSV, JSON, ORC, PARQUET, AVRO, FEATHER; encodings
gzip/zstd/bzip2/snappy) and the universal `dc.get/put/copy/list` URL API
(`api.py:97-480`, `DatastoreType` `types/media.py:353-420`). Spark
mapping per SURVEY §2.1: `spark.read.<fmt>` with options; exotic media →
`binaryFile`; Feather → Arrow on the driver (not splittable; scale note
in `read_feather`).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

# content-type key → (spark format, default options)
FORMATS: dict[str, tuple[str, dict[str, Any]]] = {
    "parquet": ("parquet", {}),
    "orc": ("orc", {}),
    "json": ("json", {}),
    "csv": ("csv", {"header": "true", "inferSchema": "true"}),
    "tsv": ("csv", {"header": "true", "inferSchema": "true", "sep": "\t"}),
    "psv": ("csv", {"header": "true", "inferSchema": "true", "sep": "|"}),
    # reference's "unescaped TSV" dialect (`utils/pyarrow.py`):
    # no quoting at all
    "unescaped_tsv": (
        "csv",
        {"header": "true", "inferSchema": "true", "sep": "\t", "quote": ""},
    ),
    # avro is handled jar-free via sources/avrofile.py (read_avro /
    # write_avro below) — spark-avro is an external module absent here
    "avro": ("avro", {}),
    "binary": ("binaryFile", {}),
    "text": ("text", {}),
}

_EXT_TO_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".json": "json",
    ".jsonl": "json",
    ".csv": "csv",
    ".tsv": "tsv",
    ".psv": "psv",
    ".avro": "avro",
    ".txt": "text",
    ".feather": "feather",
    ".png": "binary",
    ".jpg": "binary",
    ".jpeg": "binary",
    ".wav": "binary",
    ".mp4": "binary",
    ".bin": "binary",
}


def infer_format(url: str) -> str:
    base = url.rstrip("/")
    _, ext = os.path.splitext(base)
    return _EXT_TO_FORMAT.get(ext.lower(), "parquet")


# ---------------------------------------------------------------------------
# Pluggable per-content-type callbacks (reference ReadKwargsProvider /
# TableWriterFn, `utils/common.py:ReadKwargsProvider`,
# `utils/pyarrow.py:801-888`): a kwargs provider rewrites the option dict
# per format before the read/write; reader_fn/writer_fn replace the whole
# IO call for a format (the reference's pluggable table writer).
# ---------------------------------------------------------------------------
# (fmt, merged_options) -> final options
KwargsProvider = Any  # Callable[[str, dict[str, Any]], dict[str, Any]]


class ContentTypeKwargsProvider:
    """Per-content-type option overrides, the reference's
    `ContentTypeKwargsProvider` shape: `{fmt: {option: value}}` applied
    only when the read/write is for that format."""

    def __init__(self, kwargs_by_fmt: dict[str, dict[str, Any]]):
        self.kwargs_by_fmt = kwargs_by_fmt

    def __call__(self, fmt: str, options: dict[str, Any]) -> dict[str, Any]:
        return {**options, **self.kwargs_by_fmt.get(fmt, {})}


_READER_FNS: dict[str, Any] = {}
_WRITER_FNS: dict[str, Any] = {}


def register_reader_fn(fmt: str, fn) -> None:
    """Override the reader for `fmt`:
    fn(spark, url, options) -> DataFrame."""
    _READER_FNS[fmt] = fn


def register_writer_fn(fmt: str, fn) -> None:
    """Override the writer for `fmt` (reference TableWriterFn):
    fn(df, url, mode, options) -> None."""
    _WRITER_FNS[fmt] = fn


def read_url(
    spark: SparkSession,
    url: str,
    fmt: str | None = None,
    options: dict[str, Any] | None = None,
    datastore: str | None = None,
    kwargs_provider: KwargsProvider | None = None,
) -> DataFrame:
    """`dc.get` equivalent: URL → DataFrame (reference `api.py:97+`).

    Non-file datastores (bigquery/mongodb/clickhouse/iceberg/…) resolve
    through the pluggable registry (`sources/datastores.py`) by URL
    scheme or explicit `datastore=` name. `kwargs_provider` customizes
    options per content type; a registered reader_fn replaces the read
    entirely."""
    from deltacat_spark.sources.datastores import resolve

    ds = resolve(url, datastore)
    if ds is not None:
        return ds.read(spark, url, **(options or {}))
    fmt = fmt or infer_format(url)
    opts = dict(options or {})
    if kwargs_provider is not None:
        opts = kwargs_provider(fmt, opts)
    if fmt in _READER_FNS:
        return _READER_FNS[fmt](spark, url, opts)
    if fmt == "feather":
        return read_feather(spark, url)
    if fmt == "avro":
        return read_avro(spark, url)
    sfmt, defaults = FORMATS[fmt]
    reader = spark.read.format(sfmt)
    for k, v in {**defaults, **opts}.items():
        reader = reader.option(k, v)
    return reader.load(url)


def write_url(
    df: DataFrame,
    url: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    options: dict[str, Any] | None = None,
    datastore: str | None = None,
    kwargs_provider: KwargsProvider | None = None,
) -> None:
    """`dc.put` equivalent: DataFrame → URL."""
    from deltacat_spark.sources.datastores import resolve

    ds = resolve(url, datastore)
    if ds is not None:
        return ds.write(df, url, mode=mode, **(options or {}))
    fmt = fmt or infer_format(url)
    opts = dict(options or {})
    if kwargs_provider is not None:
        opts = kwargs_provider(fmt, opts)
    if fmt in _WRITER_FNS:
        return _WRITER_FNS[fmt](df, url, mode, opts)
    if fmt == "feather":
        return write_feather(df, url)
    if fmt == "avro":
        write_avro_dir(df, url).collect()
        return None
    if fmt == "binary":
        raise ValueError("binary is a read-only format (use put_files)")
    sfmt, defaults = FORMATS[fmt]
    writer = df.write.format(sfmt).mode(mode)
    for k, v in {**defaults, **opts}.items():
        writer = writer.option(k, v)
    writer.save(url)


def copy_url(
    spark: SparkSession,
    src: str,
    dst: str,
    src_fmt: str | None = None,
    dst_fmt: str | None = None,
) -> None:
    """`dc.copy`: any supported source format → any sink format
    (reference universal copy, `api.py:97-480`)."""
    write_url(read_url(spark, src, src_fmt), dst, dst_fmt)


def list_url(spark: SparkSession, url: str) -> list[dict[str, Any]]:
    """`dc.list`: child object metadata for a URL."""
    out = []
    if os.path.isdir(url):
        for name in sorted(os.listdir(url)):
            p = os.path.join(url, name)
            st = os.stat(p)
            out.append(
                {
                    "path": p,
                    "is_dir": os.path.isdir(p),
                    "bytes": st.st_size,
                    "format": infer_format(p),
                }
            )
    elif os.path.isfile(url):
        st = os.stat(url)
        out.append(
            {"path": url, "is_dir": False, "bytes": st.st_size, "format": infer_format(url)}
        )
    return out


def read_feather(spark: SparkSession, url: str) -> DataFrame:
    """Feather/Arrow IPC — not splittable and not a Spark datasource;
    loaded via Arrow on the driver. Fine for dimension-sized files; at
    scale convert to parquet first (`copy_url`)."""
    import pyarrow.feather as feather

    table = feather.read_table(url)
    return spark.createDataFrame(table.to_pandas())


def write_feather(df: DataFrame, url: str) -> None:
    """Single-file Feather via the driver — control-plane payloads only
    (model params, dimension tables). Data-plane scale path:
    `write_feather_dir`."""
    import pyarrow as pa
    import pyarrow.feather as feather

    feather.write_feather(pa.Table.from_pandas(df.toPandas()), url)


def write_feather_dir(df: DataFrame, url: str) -> DataFrame:
    """Executor-distributed Feather: one Arrow-IPC part-file per
    partition (Spark's part-file layout), written by the executors via
    `mapInPandas` — the driver never materializes data, so the path
    scales with partition count like the parquet writer. Returns the
    part manifest (path, n_rows)."""
    import uuid

    os.makedirs(url, exist_ok=True)
    run = uuid.uuid4().hex[:12]
    arrow_schema = _arrow_schema_for(df)

    def _write_partition(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.feather as feather
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = [
            pa.Table.from_pandas(b, schema=arrow_schema, preserve_index=False)
            for b in batches
        ]
        if not tables:
            return
        table = pa.concat_tables(tables)
        path = os.path.join(url, f"part-{pid:05d}-{run}.feather")
        feather.write_feather(table, path)
        yield pd.DataFrame({"path": [path], "n_rows": [table.num_rows]})

    return df.mapInPandas(_write_partition, "path string, n_rows long")


def read_feather_dir(spark: SparkSession, url: str) -> DataFrame:
    """Distributed Feather read: `binaryFile` scan of the part-files +
    Arrow-IPC decode per file inside `mapInPandas` (Arrow-batched, no
    driver materialization). Schema comes from one file's footer — a
    control-plane read."""
    import pyarrow.feather as feather

    sample = sorted(
        f for f in os.listdir(url) if f.endswith(".feather")
    )
    if not sample:
        raise FileNotFoundError(f"no .feather part files under {url}")
    arrow_schema = feather.read_table(
        os.path.join(url, sample[0])
    ).schema
    from pyspark.sql.pandas.types import from_arrow_schema

    spark_schema = from_arrow_schema(arrow_schema)
    bins = spark.read.format("binaryFile").load(
        os.path.join(url, "*.feather")
    )

    def _decode(batches):
        import pyarrow as pa
        import pyarrow.feather as feather

        for b in batches:
            for content in b["content"]:
                yield feather.read_table(
                    pa.BufferReader(content)
                ).to_pandas()

    return bins.select("content").mapInPandas(_decode, spark_schema)


def _arrow_schema_for(df: DataFrame):
    """Arrow schema equivalent of the DataFrame schema (drives the
    executor-side IPC writers so every part-file agrees)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


def read_avro(spark: SparkSession, url: str) -> DataFrame:
    """Distributed Avro read without spark-avro: `binaryFile` scan of
    the container files + pure-python decode (`sources/avrofile.py`)
    per file inside `mapInPandas`. The schema comes from one file's
    header — a control-plane read. Files are the unit of parallelism
    (same default as Spark's own avro source at these file sizes)."""
    from deltacat_spark.sources import avrofile

    files = avrofile.list_avro_files(url)
    if not files:
        raise FileNotFoundError(f"no .avro files under {url}")
    with open(files[0], "rb") as f:
        head = f.read(1 << 16)
    avro_schema, _ = avrofile.iter_container(_whole_if_small(files[0], head))
    spark_schema = avrofile.spark_schema_for(avro_schema)
    pattern = url if os.path.isfile(url) else os.path.join(url, "*.avro")
    bins = spark.read.format("binaryFile").load(pattern)

    def _decode(batches):
        import pandas as pd

        for b in batches:
            for content in b["content"]:
                _, it = avrofile.iter_container(bytes(content))
                rows = list(it)
                yield pd.DataFrame(
                    rows, columns=[f.name for f in spark_schema.fields]
                )

    return bins.select("content").mapInPandas(_decode, spark_schema)


def _whole_if_small(path: str, head: bytes) -> bytes:
    """The header metadata map is unbounded in principle; re-read the
    whole file only when 64 KiB wasn't enough to parse it."""
    from deltacat_spark.sources import avrofile

    try:
        avrofile.iter_container(head)
        return head
    except Exception:
        with open(path, "rb") as f:
            return f.read()


def write_avro(df: DataFrame, url: str) -> None:
    """Single-file Avro via the driver — control-plane payloads only."""
    from deltacat_spark.sources import avrofile

    schema = avrofile.avro_schema_for(df.schema)
    rows = [r.asDict(recursive=True) for r in df.collect()]
    avrofile.write_container(url, schema, rows)


def write_avro_dir(df: DataFrame, url: str) -> DataFrame:
    """Executor-distributed Avro: one object container file per
    partition written inside `mapInPandas` (driver never materializes
    data — mirrors `write_feather_dir`). Returns (path, n_rows)."""
    import uuid

    from deltacat_spark.sources import avrofile

    os.makedirs(url, exist_ok=True)
    run = uuid.uuid4().hex[:12]
    avro_schema = avrofile.avro_schema_for(df.schema)
    arrow_schema = _arrow_schema_for(df)

    def _write_partition(batches):
        import pandas as pd
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = [
            pa.Table.from_pandas(b, schema=arrow_schema, preserve_index=False)
            for b in batches
        ]
        if not tables:
            return
        # Arrow's to_pylist gives clean python scalars/None (pandas
        # would smuggle NaN/np.int64 into the byte encoder)
        rows = pa.concat_tables(tables).to_pylist()
        path = os.path.join(url, f"part-{pid:05d}-{run}.avro")
        avrofile.write_container(path, avro_schema, rows)
        yield pd.DataFrame({"path": [path], "n_rows": [len(rows)]})

    return df.mapInPandas(_write_partition, "path string, n_rows long")
