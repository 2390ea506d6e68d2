"""Streaming change-feed source: the table's commit log as a Structured
Streaming micro-batch source (`spark.readStream.format("dcs_table_changes")`).

The reference's streaming surface is embryonic (SURVEY §2.6); this is
the natural Spark-native CDC stream over the engine's own commit log:
offsets ARE commit versions, so Spark's offset checkpointing gives
exactly-once delivery of each commit's change rows with zero extra
bookkeeping — a commit is immutable, so replaying an offset range after
failure yields byte-identical batches. Implemented on Spark 4's Python
DataSource API (driver plans per-commit file partitions; executors read
the parquet change files as Arrow RecordBatches — no row-at-a-time
Python).

Semantics match `Catalog.read_changes` (`catalog/catalog.py:read_changes`):

* delta commits (APPEND/ADD/CHRONO/UPSERT/equality-DELETE) stream their
  delta files' rows stamped `_commit_version` / `_change_type`;
* CoW commits with `cdc.enabled` sidecars stream the sidecar rows;
* commits from unresolved multi-table transactions gate the offset: the
  latest offset only advances over the contiguous prefix of resolved
  commits (a pending txn pauses the feed rather than skipping — once
  resolved, the feed continues in order; aborted-txn commits are
  skipped, exactly like snapshot/CDC batch reads);
* positional-delete commits carry (file, pos) tuples, not rows — the
  stream fails on them by default (`on_positional_delete=fail`) or
  skips with `skip` (the batch `read_changes` reconstructs those rows
  via a snapshot join, which a per-partition stream reader cannot).

Paths are read with pyarrow's local filesystem — the source currently
supports catalogs whose paths executors can open directly (same contract
as the rest of the data plane on LocalFS).
"""

from __future__ import annotations

import dataclasses
import os
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyarrow import RecordBatch

FORMAT_NAME = "dcs_table_changes"


@dataclasses.dataclass
class _ChangeFilePartition(InputPartition):
    path: str
    version: int
    change_type: str
    # comma-joined payload column subset for partial deltas (None =>
    # full-row change) — same `_change_cols` contract as the batch
    # `read_changes` (see its docstring for the documented semantics)
    change_cols: "str | None" = None


def _table_root(options) -> str:
    return os.path.join(
        options["root"], options.get("namespace", "default"), options["table"]
    )


def _open_log(options):
    """CommitLog + txn-status callable for the optioned table (LocalFS —
    see module docstring)."""
    from deltacat_spark.storage.commit import CommitLog, TxnMarkers

    markers = TxnMarkers(options["root"])
    return CommitLog(_table_root(options), txn_status=markers.status)


def _table_schema(options):
    """The table's deltacat Schema (fields carry past_default etc.)."""
    from deltacat_spark.storage.snapshot import Snapshot

    snap = Snapshot.of(_open_log(options))
    if snap.schema is None:
        raise ValueError("change-feed stream requires a table schema")
    return snap.schema


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self._options = dict(options)
        # Target projection: every data field's (name, arrow type,
        # past_default) — files from older schema generations are
        # normalized executor-side exactly like the batch scan
        # (`catalog.py:_scan` past_default fill).
        from pyspark.sql.pandas.types import to_arrow_type

        sch = _table_schema(options)
        self._fields = [
            (f.name, to_arrow_type(f.data_type), f.past_default)
            for f in sch.fields
        ]
        self._on_pos_delete = self._options.get("on_positional_delete", "fail")

    # -- offsets --------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": int(self._options.get("from_version", 0))}

    def latestOffset(self) -> dict:
        log = _open_log(self._options)
        latest = 0
        for v in log.versions():
            c = log.read_commit(v)
            pt = getattr(c, "pending_txn", None)
            if pt is not None and log.txn_status(pt) == "pending":
                # Unresolved txn: hold the feed at the last resolved
                # commit so nothing is skipped if it later commits.
                break
            latest = v
        return {"version": latest}

    # -- planning (driver) ---------------------------------------------
    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        from deltacat_spark.storage.commit import DeltaType

        log = _open_log(self._options)
        troot = _table_root(self._options)
        out: list[InputPartition] = []
        for c in log.replay(
            version_as_of=int(end["version"]),
            start_after=int(start["version"]),
        ):
            pt = getattr(c, "pending_txn", None)
            if pt is not None and log.txn_status(pt) != "committed":
                continue  # aborted: hidden forever (pending never lands
                # inside a planned range — latestOffset gates it)
            if c.delta_type == DeltaType.POSITIONAL_DELETE and c.adds:
                if self._on_pos_delete == "skip":
                    continue
                raise ValueError(
                    f"commit {c.version} is a positional delete; the "
                    "change-feed stream cannot reconstruct deleted rows "
                    "(use batch read_changes, or on_positional_delete="
                    "'skip')"
                )
            if c.delta_type is not None and c.adds:
                files, change_type = c.adds, c.delta_type
            elif c.cdc_files:
                files, change_type = c.cdc_files, c.operation
            else:
                continue  # CoW rewrite without CDC sidecars / metadata-only
            for a in files:
                out.append(
                    _ChangeFilePartition(
                        path=os.path.join(troot, a["path"]),
                        version=c.version,
                        change_type=change_type,
                        change_cols=(
                            ",".join(a["payload_cols"])
                            if a.get("payload_cols")
                            else None
                        ),
                    )
                )
        return out

    # -- reading (executors) -------------------------------------------
    def read(
        self, partition: _ChangeFilePartition
    ) -> Iterator["RecordBatch"]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(partition.path)
        n = len(t)
        cols, names = [], []
        for name, atype, default in self._fields:
            if name in t.column_names:
                col = t[name].cast(atype)
            elif default is not None:
                col = pa.array([default] * n).cast(atype)
            else:
                col = pa.nulls(n, atype)
            cols.append(col)
            names.append(name)
        cols.append(pa.array([partition.version] * n, pa.int64()))
        names.append("_commit_version")
        cols.append(pa.array([partition.change_type] * n, pa.string()))
        names.append("_change_type")
        cols.append(pa.array([partition.change_cols] * n, pa.string()))
        names.append("_change_cols")
        yield from pa.table(cols, names=names).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; the log is immutable


class TableChangesDataSource(DataSource):
    """`spark.readStream.format("dcs_table_changes")` — register with
    `spark.dataSource.register(TableChangesDataSource)` (done by
    `streaming.api.stream_read_changes`). Options: root, table,
    namespace, from_version, on_positional_delete."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        sch = _table_schema(self.options).to_struct_type()
        return StructType(
            list(sch.fields)
            + [
                StructField("_commit_version", LongType()),
                StructField("_change_type", StringType()),
                StructField("_change_cols", StringType()),
            ]
        )

    def streamReader(self, schema: StructType) -> TableChangesStreamReader:
        return TableChangesStreamReader(schema, self.options)
