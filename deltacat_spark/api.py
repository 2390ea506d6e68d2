"""Top-level `dc`-style convenience API.

Mirrors the reference's public surface (`deltacat/__init__.py:5-115`):
``init`` + catalog functions (`create_table`, `read_table`,
`write_to_table = write`, `alter/drop/rename/truncate_table`, namespace
CRUD) and the URL dataset functions (`get/put/copy/list`). A
module-level default catalog keeps call sites as terse as the
reference's ``dc.write(df, "table")``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from deltacat_spark.catalog import Catalog
from deltacat_spark.session import build_session
from deltacat_spark.sources.formats import copy_url, list_url, read_url, write_url

_default: Catalog | None = None


def init(root: str, spark: SparkSession | None = None) -> Catalog:
    """Initialize (and set) the default catalog at `root`."""
    global _default
    _default = Catalog(spark or build_session(), root)
    return _default


def catalog() -> Catalog:
    if _default is None:
        raise RuntimeError("call deltacat_spark.api.init(root) first")
    return _default


# -- catalog surface ---------------------------------------------------------
def create_table(table: str, **kwargs: Any) -> None:
    catalog().create_table(table, **kwargs)


def read_table(table: str, **kwargs: Any) -> DataFrame:
    return catalog().read_table(table, **kwargs)


def write_to_table(df: DataFrame, table: str, **kwargs: Any) -> None:
    catalog().write_to_table(df, table, **kwargs)


# reference aliases (`deltacat/__init__.py:114-115`)
write = write_to_table
read = read_table


def alter_table(table: str, **kwargs: Any) -> None:
    catalog().alter_table(table, **kwargs)


def drop_table(table: str, **kwargs: Any) -> None:
    catalog().drop_table(table, **kwargs)


def rename_table(table: str, new_name: str, **kwargs: Any) -> None:
    catalog().rename_table(table, new_name, **kwargs)


def truncate_table(table: str, **kwargs: Any) -> None:
    catalog().truncate_table(table, **kwargs)


def restore_table(table: str, **kwargs: Any) -> int:
    return catalog().restore_table(table, **kwargs)


def clone_table(src: str, dst: str, **kwargs: Any) -> None:
    catalog().clone_table(src, dst, **kwargs)


def history(table: str, **kwargs: Any) -> "list[dict]":
    return catalog().history(table, **kwargs)


def transaction():
    """Interactive multi-op transaction (supports pause()/resume)."""
    return catalog().transaction()


def create_namespace(namespace: str, **kwargs: Any) -> None:
    catalog().create_namespace(namespace, **kwargs)


def list_namespaces() -> list[str]:
    return catalog().list_namespaces()


def list_tables(namespace: str = "default") -> list[str]:
    return catalog().list_tables(namespace)


def table_exists(table: str, namespace: str = "default") -> bool:
    return catalog().table_exists(table, namespace)


# -- URL dataset surface (`dc.get/put/copy/list`, reference api.py:97-480) ---
def get(url: str, **kwargs: Any) -> DataFrame:
    return read_url(catalog().spark, url, **kwargs)


def put(df: DataFrame, url: str, **kwargs: Any) -> None:
    write_url(df, url, **kwargs)


def copy(src: str, dst: str, **kwargs: Any) -> None:
    copy_url(catalog().spark, src, dst, **kwargs)


def list(url: str) -> "list[dict]":  # noqa: A001 — mirrors reference name
    return list_url(catalog().spark, url)
