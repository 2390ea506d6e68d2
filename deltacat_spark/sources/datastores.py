"""Pluggable datastore registry for the universal copy API.

Reference surface: `dc.get/put/copy/list` dispatch on a DatastoreType
parsed from the URL (`api.py:97-480`; the ~30 types in
`types/media.py:353-420`). Spark realization: every connector-backed
datastore IS a Spark datasource — resolving a datastore means resolving
`spark.read.format(<fmt>)` plus the option mapping from the URL. The
registry holds that mapping; exotic backends work as soon as their
connector jar is on the Spark classpath (`--packages`), and fail with
an actionable error naming the package when it is not. File formats
(csv/parquet/orc/json/avro/binary/text/feather) keep their fast path in
`sources/formats.py`.

Extension point: `register(Datastore(...))` — a user datastore only
needs a name, its URL schemes, and read/write callables.

Environment note (round-3 audit, revised round 10): this build
environment ships NO lakehouse-connector jars (pyspark's `jars/` has
no iceberg/delta/hudi artifacts and there is no network for
`--packages`). Round 10 removed the blockage for Iceberg and Delta
Lake: `sources/iceberg.py` and `sources/deltalake.py` implement the
published table specs directly (metadata JSON, Avro manifests via
`sources/avrofile.py`, Delta JSON log + checkpoint parquet), so the
converter-session round-trip — read an external table, MERGE
in-engine, commit position deletes back as a REAL Iceberg snapshot
(reference `compute/converter/converter_session.py:46-429`) — now runs
jar-free end-to-end (`iceberg.convert_equality_deletes_to_position`).
The `iceberg` / `deltalake` registry rows resolve to these native
implementations; connector-backed rows (bigquery/mongodb/...) still
require their jars and fail with an actionable package hint.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable
from urllib.parse import parse_qsl, urlparse

from pyspark.sql import DataFrame, SparkSession


class DatastoreUnavailableError(RuntimeError):
    """The datastore's Spark connector is not on the classpath (or its
    client library is not installed)."""


@dataclass
class Datastore:
    """One datastore type: how to turn a URL into a Spark read/write."""

    name: str
    schemes: list[str]
    # spark datasource short name, e.g. "bigquery", "mongodb", "jdbc"
    spark_format: str | None = None
    # connector coordinate to name in errors, e.g.
    # "com.google.cloud.spark:spark-bigquery-with-dependencies_2.13"
    package_hint: str | None = None
    # URL → reader/writer options (default: query params + path option)
    url_options: Callable[[str], dict[str, str]] | None = None
    reader: Callable[..., DataFrame] | None = None
    writer: Callable[..., None] | None = None
    extra_options: dict[str, Any] = field(default_factory=dict)

    def _options(self, url: str) -> dict[str, str]:
        if self.url_options is not None:
            return self.url_options(url)
        parsed = urlparse(url)
        opts = dict(parse_qsl(parsed.query))
        opts.setdefault("path", url.split("?", 1)[0])
        return opts

    def read(
        self, spark: SparkSession, url: str, **options: Any
    ) -> DataFrame:
        if self.reader is not None:
            return self.reader(spark, url, **options)
        assert self.spark_format is not None
        reader = spark.read.format(self.spark_format)
        for k, v in {
            **self.extra_options,
            **self._options(url),
            **options,
        }.items():
            reader = reader.option(k, v)
        try:
            return reader.load()
        except Exception as exc:  # connector missing on the classpath
            self._raise_if_unavailable(exc)
            raise

    def write(
        self,
        df: DataFrame,
        url: str,
        mode: str = "append",
        **options: Any,
    ) -> None:
        if self.writer is not None:
            self.writer(df, url, mode=mode, **options)
            return
        assert self.spark_format is not None
        writer = df.write.format(self.spark_format).mode(mode)
        for k, v in {
            **self.extra_options,
            **self._options(url),
            **options,
        }.items():
            writer = writer.option(k, v)
        try:
            writer.save()
        except Exception as exc:
            self._raise_if_unavailable(exc)
            raise

    def _raise_if_unavailable(self, exc: Exception) -> None:
        msg = str(exc)
        if (
            "Failed to find data source" in msg
            or "ClassNotFoundException" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        ):
            hint = (
                f" (launch Spark with --packages {self.package_hint})"
                if self.package_hint
                else ""
            )
            raise DatastoreUnavailableError(
                f"datastore {self.name!r} needs the "
                f"{self.spark_format!r} Spark connector on the "
                f"classpath{hint}"
            ) from exc


_REGISTRY: dict[str, Datastore] = {}
_SCHEME_TO_NAME: dict[str, str] = {}


def register(ds: Datastore) -> None:
    _REGISTRY[ds.name] = ds
    for s in ds.schemes:
        _SCHEME_TO_NAME[s] = ds.name


def registered() -> dict[str, Datastore]:
    return dict(_REGISTRY)


def resolve(url: str, datastore: str | None = None) -> Datastore | None:
    """Datastore for a URL (explicit name > scheme), None = file path.

    URLs may use the reference's `<type>+<url>` convention
    (e.g. `iceberg+thrift://...`) or a registered scheme directly."""
    if datastore is not None:
        if datastore not in _REGISTRY:
            raise KeyError(
                f"unknown datastore {datastore!r}; registered: "
                f"{sorted(_REGISTRY)}"
            )
        return _REGISTRY[datastore]
    scheme = urlparse(url).scheme.lower()
    if "+" in scheme:  # reference convention: <DatastoreType>+<URL>
        prefix = scheme.split("+", 1)[0]
    elif not scheme and "+" in url:  # e.g. delta+/tmp/x (no ':' scheme)
        prefix = url.split("+", 1)[0].lower()
    else:
        prefix = None
    if prefix is not None:
        if prefix in _REGISTRY:
            return _REGISTRY[prefix]
        if prefix in _SCHEME_TO_NAME:  # scheme alias, e.g. delta+file://
            return _REGISTRY[_SCHEME_TO_NAME[prefix]]
    return _REGISTRY.get(_SCHEME_TO_NAME.get(scheme, ""))


def _mongo_options(url: str) -> dict[str, str]:
    parsed = urlparse(url)
    opts = dict(parse_qsl(parsed.query))
    opts["connection.uri"] = url.split("?", 1)[0]
    return opts


def _bigquery_options(url: str) -> dict[str, str]:
    # bigquery://<project>/<dataset>[?table=...] (reference convention)
    parsed = urlparse(url)
    opts = dict(parse_qsl(parsed.query))
    dataset = parsed.path.strip("/")
    if parsed.hostname:
        opts.setdefault("parentProject", parsed.hostname)
    if dataset:
        opts.setdefault("dataset", dataset)
    if "table" in opts:
        opts["table"] = opts["table"]
    return opts


def _jdbc_options(url: str) -> dict[str, str]:
    opts = dict(parse_qsl(urlparse(url).query))
    opts["url"] = url.split("?", 1)[0]
    return opts


def _strip_type_prefix(url: str) -> str:
    """Strip a leading `<type>+` datastore prefix from a URL.

    Handles both `delta+file:///x` (prefix inside the parsed scheme)
    and `delta+/tmp/x` (no `:` so urlparse sees no scheme at all —
    the part before the first '+' must match a registered datastore
    name or scheme alias)."""
    scheme = urlparse(url).scheme
    if "+" in scheme:
        return url.split("+", 1)[1]
    if not scheme and "+" in url:
        prefix = url.split("+", 1)[0].lower()
        if prefix in _REGISTRY or prefix in _SCHEME_TO_NAME:
            return url.split("+", 1)[1]
    return url


def _table_path_options(url: str) -> dict[str, str]:
    # <type>+<path>: strip the type prefix, pass the rest as path
    path = _strip_type_prefix(url)
    opts = dict(parse_qsl(urlparse(path).query))
    opts["path"] = path.split("?", 1)[0]
    return opts


def _local_table_path(url: str) -> str:
    """Root path for the jar-free lakehouse readers: strips the
    `<type>+` prefix and a `file://` scheme down to a plain path."""
    p = _table_path_options(url)["path"]
    if p.startswith("file://"):
        p = p[len("file://"):]
    if not p.startswith("/"):
        raise ValueError(
            f"datastore table URL {url!r} resolved to a relative path "
            f"{p!r}; use an absolute path or file:// URL"
        )
    return p


# Connector-backed datastores (reference DatastoreType parity; each is a
# standard Spark datasource — available when its jar is on the classpath).
for _ds in [
    Datastore(
        "bigquery",
        ["bigquery"],
        spark_format="bigquery",
        package_hint="com.google.cloud.spark:spark-bigquery-with-dependencies_2.13",
        url_options=_bigquery_options,
    ),
    Datastore(
        "mongodb",
        ["mongodb", "mongodb+srv"],
        spark_format="mongodb",
        package_hint="org.mongodb.spark:mongo-spark-connector_2.13",
        url_options=_mongo_options,
    ),
    Datastore(
        "clickhouse",
        ["clickhouse"],
        spark_format="jdbc",
        package_hint="com.clickhouse:clickhouse-jdbc",
        url_options=_jdbc_options,
        extra_options={"driver": "com.clickhouse.jdbc.ClickHouseDriver"},
    ),
    Datastore(
        "jdbc",
        ["jdbc"],
        spark_format="jdbc",
        url_options=_jdbc_options,
    ),
    Datastore(
        # jar-free: the Delta log is JSON+parquet per the public
        # protocol spec, so sources/deltalake.py reads/writes it with
        # Spark's native parquet scan as the data plane — no
        # io.delta:delta-spark needed (this sandbox has none)
        "deltalake",
        ["deltalake", "delta"],
        reader=lambda spark, url, **opts: __import__(
            "deltacat_spark.sources.deltalake", fromlist=["read_delta"]
        ).read_delta(
            spark, _local_table_path(url), **opts
        ),
        writer=lambda df, url, mode="append", **opts: __import__(
            "deltacat_spark.sources.deltalake", fromlist=["write_delta"]
        ).write_delta(
            df,
            _local_table_path(url),
            mode=("append" if mode == "auto" else mode),
            **opts,
        ),
    ),
    Datastore(
        "deltasharing",
        ["deltasharing"],
        spark_format="deltaSharing",
        package_hint="io.delta:delta-sharing-spark_2.13",
        url_options=_table_path_options,
    ),
    Datastore(
        # jar-free: v2 metadata JSON + avro manifests via
        # sources/iceberg.py + sources/avrofile.py (no
        # iceberg-spark-runtime in this environment)
        "iceberg",
        ["iceberg"],
        reader=lambda spark, url, **opts: __import__(
            "deltacat_spark.sources.iceberg", fromlist=["read_iceberg"]
        ).read_iceberg(
            spark, _local_table_path(url), **opts
        ),
        writer=lambda df, url, mode="append", **opts: __import__(
            "deltacat_spark.sources.iceberg", fromlist=["write_iceberg"]
        ).write_iceberg(
            df,
            _local_table_path(url),
            mode=("append" if mode == "auto" else mode),
            **opts,
        ),
    ),
    Datastore(
        # jar-free: CoW timeline + file-slice layout via
        # sources/hudi.py (no hudi-spark bundle in this environment)
        "hudi",
        ["hudi"],
        reader=lambda spark, url, **opts: __import__(
            "deltacat_spark.sources.hudi", fromlist=["read_hudi"]
        ).read_hudi(
            spark, _local_table_path(url), **opts
        ),
        writer=lambda df, url, mode="append", **opts: __import__(
            "deltacat_spark.sources.hudi", fromlist=["write_hudi"]
        ).write_hudi(
            df,
            _local_table_path(url),
            operation=("insert" if mode == "append" else
                       "upsert" if mode == "auto" else mode),
            **opts,
        ),
    ),
    Datastore(
        "databricks",
        ["databricks"],
        spark_format="databricks",
        package_hint="databricks-jdbc",
        url_options=_jdbc_options,
    ),
    Datastore(
        "lance",
        ["lance"],
        spark_format="lance",
        package_hint="com.lancedb:lance-spark-bundle_2.13",
        url_options=_table_path_options,
    ),
    Datastore(
        "tfrecords",
        ["tfrecords"],
        spark_format="tfrecord",
        package_hint="com.linkedin.sparktfrecord:spark-tfrecord_2.13",
        url_options=_table_path_options,
    ),
    Datastore(
        "xml",
        ["xml"],
        spark_format="xml",
        url_options=_table_path_options,
    ),
]:
    register(_ds)
