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


def read_transaction(txn_id: str) -> "dict[str, DataFrame]":
    """Sealed-transaction replay: each touched table read as-of the
    txn's last commit (reference `read_transaction`)."""
    return catalog().read_transaction(txn_id)


def optimize_table(table: str, **kwargs: Any) -> None:
    """Compaction (whole-table, incremental small-file, zorder, or
    `partition_filter`-scoped)."""
    catalog().optimize_table(table, **kwargs)


def vacuum(table: str, **kwargs: Any):
    """Janitor: delete unreferenced files; `dry_run=True` reports
    without deleting. Returns an int-compatible VacuumReport."""
    return catalog().vacuum(table, **kwargs)


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


# -- URL dataset utilities the reference DECLARES but stubs
#    (`api.py:311-491` — concat/delete/move/touch/exists/query/tail/head
#    are all `raise NotImplementedError` there). Implemented for real
#    here, Spark-first.
def concat(src: str, dst: str, **kwargs: Any) -> None:
    """Append the source dataset's rows to the destination dataset
    (both URLs; formats may differ — rows go through the DataFrame)."""
    write_url(read_url(catalog().spark, src), dst, mode="append", **kwargs)


def delete(url: str) -> None:
    """Delete a dataset file or directory."""
    import os as _os
    import shutil as _shutil

    if _os.path.isdir(url):
        _shutil.rmtree(url)
    else:
        _os.unlink(url)


def move(src: str, dst: str) -> None:
    """Rename/move a dataset path (O(1) on directory stores)."""
    import os as _os

    _os.replace(src, dst)


def touch(path: str) -> None:
    """Create an empty marker file (parents created)."""
    import os as _os

    _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a", encoding="utf-8"):
        _os.utime(path, None)


def exists(path: str) -> bool:
    import os as _os

    return _os.path.exists(path)


_FROM_PATH = None  # compiled lazily


def query(expression: str) -> DataFrame:
    """SQL over dataset URLs: quoted paths in FROM/JOIN clauses resolve
    to temp views (DuckDB-style `SELECT * FROM '/data/x.parquet'`),
    then the statement runs through Spark SQL — full Catalyst pushdown
    into each referenced file."""
    import re as _re

    global _FROM_PATH
    if _FROM_PATH is None:
        _FROM_PATH = _re.compile(
            r"(?i)\b(FROM|JOIN)\s+'([^']+)'"
        )
    spark = catalog().spark
    sql = expression
    for n, m in enumerate(_FROM_PATH.finditer(expression)):
        path = m.group(2)
        view = f"__dcs_q{n}"
        read_url(spark, path).createOrReplaceTempView(view)
        sql = sql.replace(f"'{path}'", view, 1)
    return spark.sql(sql)


def head(url: str, n: int = 5) -> "list":
    """First n rows of a dataset URL."""
    return read_url(catalog().spark, url).head(n)


def tail(url: str, n: int = 5) -> "list":
    """Last n rows of a dataset URL (file/row order)."""
    return read_url(catalog().spark, url).tail(n)


# -- remaining interface parity (reference catalog/interface.py) -------------
initialize = init  # reference `initialize` == create/attach a catalog


def get_table(table: str, **kwargs: Any) -> "dict | None":
    return catalog().get_table(table, **kwargs)


def refresh_table(table: str, **kwargs: Any) -> None:
    catalog().refresh_table(table, **kwargs)


def get_namespace(namespace: str) -> "dict | None":
    return catalog().get_namespace(namespace)


def alter_namespace(namespace: str, **kwargs: Any) -> None:
    catalog().alter_namespace(namespace, **kwargs)


def default_namespace() -> str:
    return catalog().default_namespace()


def sql(query: str, **kwargs: Any) -> DataFrame:
    """ANSI SQL over catalog tables (temp-view bridge to spark.sql)."""
    return catalog().sql(query, **kwargs)
