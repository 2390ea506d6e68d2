"""Pythonic catalog API over the table format — the `dc.*` surface.

Mirrors the reference's catalog interface (`catalog/interface.py`,
`catalog/main/impl.py`; top-level exports `deltacat/__init__.py:5-115`)
re-expressed Spark-first: namespace/table CRUD, six write modes, snapshot
reads with projection/pushdown/time-travel, compaction.
"""

from deltacat_spark.catalog.catalog import (
    Catalog,
    TableNotFoundError,
    TableWriteMode,
    VacuumReport,
)
from deltacat_spark.catalog.materialize import (
    refresh_incremental,
    stream_refresh_incremental,
)

__all__ = [
    "Catalog",
    "TableNotFoundError",
    "VacuumReport",
    "TableWriteMode",
    "refresh_incremental",
    "stream_refresh_incremental",
]
