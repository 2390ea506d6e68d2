"""Structured-Streaming sources over the jar-free lakehouse interop
tables — Hudi's incremental timeline, Delta's append log, and
Iceberg's append snapshots as micro-batch streams (Spark 4 Python
DataSource API, same pattern as the engine's own change-feed source in
`cdc_source.py`).

Reference surface: DatastoreTypes HUDI / DELTA_LAKE
(`types/media.py:353-420`); Hudi's incremental pull is the format's
headline feature and its DeltaStreamer-style consumption model is a
stream of commit ranges — exactly a Structured Streaming offset range.

* `dcs_hudi_incremental`: offsets ARE timeline instants. Each
  micro-batch is the file slices WRITTEN by the instants in
  (start, end], row-filtered executor-side to `_hoodie_commit_time ==
  that instant` — a rewritten CoW slice carries old rows, so the
  filter is what keeps delivery exactly-once. Stamped
  `_commit_instant`.
* `dcs_iceberg_appends`: offsets are Iceberg sequence numbers; each
  micro-batch is the append snapshots' newly-ADDED manifest entries
  (status==1, entry snapshot-id == the streaming snapshot), identity
  partition columns reconstructed from manifest metadata. Non-append
  snapshots (overwrite / position-delete) fail or skip via
  `on_non_append`.
* `dcs_delta_appends`: offsets are Delta versions; each micro-batch is
  the `add` actions of the versions in range, with hive-staged
  partition columns reconstructed from `partitionValues` (the files
  themselves don't carry them). `remove` actions mean a rewrite the
  stream cannot represent — fail by default, `on_remove=skip` skips
  that version's adds-after-removes semantics is NOT inferred (the
  whole version is delivered as its adds; use the engine's CDC feed
  for row-level changes).

Both sources plan driver-side over O(commits) JSON — the formats' own
metadata model — and read parquet as Arrow RecordBatches executor-side
(no row-at-a-time Python). Executor memory is bounded per ROW GROUP,
not per file (`_iter_row_group_tables`): a multi-GB file slice streams
through the Python worker in row-group-sized chunks. Offset
checkpointing is Spark's; the timelines are immutable, so failure
replay yields identical batches.
"""

from __future__ import annotations

import dataclasses
import json
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

HUDI_FORMAT_NAME = "dcs_hudi_incremental"
DELTA_FORMAT_NAME = "dcs_delta_appends"
ICEBERG_FORMAT_NAME = "dcs_iceberg_appends"


def _iter_row_group_tables(path: str):
    """Stream a parquet file ROW GROUP at a time. The Python
    DataSource readers below materialize their file slice in Python,
    so peak executor memory must be bounded by one row group — not the
    whole file — or a multi-GB slice OOMs the worker at scale. Writers
    control the bound via their parquet row-group size."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    for i in range(f.metadata.num_row_groups):
        yield f.read_row_group(i)


# ---------------------------------------------------------------------------
# Hudi incremental
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _HudiSlicePartition(InputPartition):
    path: str
    instant: str
    framed: bool = False  # HoodieLogFormat block framing (#HUDI#)


def _hudi_data_fields(root: str):
    """(name, arrow_type) for the table's data columns, from a live
    slice's parquet footer (meta columns excluded)."""
    import pyarrow.parquet as pq

    from deltacat_spark.sources.hudi import META_COLS, file_slices

    slices = [s for s in file_slices(root) if s["path"]]
    if not slices:
        raise ValueError(f"no live Hudi file slices under {root}")
    sch = pq.read_schema(os.path.join(root, slices[0]["path"]))
    return [
        (name, sch.field(name).type)
        for name in sch.names
        if name not in set(META_COLS)
    ]


class HudiIncrementalStreamReader(DataSourceStreamReader):
    """`max_instants_per_trigger` (option, default unlimited) paces a
    continuously-running query: each trigger's batch covers at most N
    timeline instants, bounding per-batch planning and sink commits —
    Hudi's own read-rate-limit convention. Exactness is untouched
    (offsets stay instants; the remainder delivers on later triggers).
    Measured r13: Trigger.AvailableNow falls back to ONE batch for
    Python sources (all instants in a single micro-batch already), so
    the knob matters for processingTime triggers, not drains.

    RESTART pacing (r14, ADVICE): Spark calls latestOffset() before
    the reader ever sees the checkpointed start, so a fresh reader has
    no floor and the first post-restart batch would cover the whole
    backlog — the exact situation the knob exists for. The
    `pacing_floor_dir` option closes it: commit() persists the
    committed end there (atomic rename), __init__ reloads it. The
    persisted floor equals the query's own checkpointed offset, so
    capping from it can never regress offsets; point it somewhere
    query-private (e.g. next to the checkpointLocation). Without the
    option, only the first post-restart batch is uncapped (the floor
    re-derives at partitions() time) — documented, not silent."""

    def __init__(self, options):
        self._root = options["path"] if "path" in options else options["root"]
        self._from = options.get("from_instant", "")
        self._fields = _hudi_data_fields(self._root)
        mi = options.get("max_instants_per_trigger")
        self._max_instants = int(mi) if mi is not None else None
        self._floor: str | None = None  # last committed/seen end
        self._floor_dir = options.get("pacing_floor_dir")
        if self._floor_dir:
            p = os.path.join(self._floor_dir, "hudi_pacing_floor.txt")
            if os.path.isfile(p):
                floor = open(p).read().strip()
                if floor:
                    self._floor = floor

    def initialOffset(self) -> dict:
        self._floor = self._from
        return {"instant": self._from}

    def latestOffset(self) -> dict:
        from deltacat_spark.sources.hudi import completed_instants

        instants = completed_instants(self._root)
        if not instants:
            return {"instant": self._from}
        if self._max_instants is not None and self._floor is not None:
            pending = [i for i in instants if i > self._floor]
            if pending:
                end = pending[
                    min(self._max_instants, len(pending)) - 1
                ]
                return {"instant": end}
            return {"instant": self._floor}
        return {"instant": instants[-1]}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from deltacat_spark.sources import hudi_log
        from deltacat_spark.sources.hudi import (
            _commit_meta,
            _is_log_path,
            completed_instants,
        )

        out: list[InputPartition] = []
        # data-bearing commits only: replacecommits (clustering) carry
        # no new rows and would plan wasted zero-row slice scans, and
        # MoR compaction commits (compacted: true) repackage rows whose
        # origin base/log files were already delivered. deltacommits
        # (MoR writes — base files for new groups + log files for
        # updates) ARE data-bearing.
        for instant in completed_instants(
            self._root, kinds=("commit", "deltacommit")
        ):
            if not (start["instant"] < instant <= end["instant"]):
                continue
            meta = _commit_meta(self._root, instant)
            if meta.get("compacted"):
                continue
            for stats in meta.get("partitionToWriteStats", {}).values():
                for st in stats:
                    p = os.path.join(self._root, st["path"])
                    # a real Hudi MoR writer's log files are
                    # HoodieLogFormat block streams — decoded by
                    # hudi_log; per-instant block filtering keeps each
                    # micro-batch exactly that instant's rows even when
                    # one appended file is registered by many commits
                    framed = _is_log_path(st["path"]) and hudi_log.is_framed(p)
                    out.append(
                        _HudiSlicePartition(
                            path=p, instant=instant, framed=framed
                        )
                    )
        # pacing floor: after a restart the checkpointed start arrives
        # here first — later latestOffset() calls cap relative to it
        if self._floor is None or start["instant"] > self._floor:
            self._floor = start["instant"]
        return out

    def read(self, partition: _HudiSlicePartition) -> Iterator["RecordBatch"]:
        import pyarrow as pa
        import pyarrow.compute as pc

        for t in self._slice_tables(partition):
            # exactly-once: only rows THIS instant wrote (a rewritten
            # CoW slice carries earlier rows with their original commit
            # times)
            t = t.filter(
                pc.equal(t["_hoodie_commit_time"], partition.instant)
            )
            if "_hoodie_is_deleted" in t.column_names:
                # hard/soft delete markers (r14: DELETE blocks decode as
                # marker rows) are not upserts — the stream delivers
                # data rows only
                t = t.filter(
                    pc.invert(
                        pc.coalesce(
                            t["_hoodie_is_deleted"], pa.scalar(False)
                        )
                    )
                )
            n = len(t)
            if n == 0:
                continue
            # a MoR log file's column set can differ from the base
            # schema (e.g. a _hoodie_is_deleted marker write) — absent
            # table columns deliver as nulls
            cols = [
                t[name].cast(atype)
                if name in t.column_names
                else pa.nulls(n, atype)
                for name, atype in self._fields
            ]
            names = [name for name, _ in self._fields]
            cols.append(pa.array([partition.instant] * n, pa.string()))
            names.append("_commit_instant")
            yield from pa.table(cols, names=names).to_batches()

    def _slice_tables(self, partition: _HudiSlicePartition):
        """Arrow tables of one slice file: parquet row-group-bounded,
        or (framed logs) the partition instant's decoded data blocks —
        block granularity bounds executor memory the way row groups do
        for parquet (a Hudi writer caps blocks at its log block size)."""
        if not partition.framed:
            yield from _iter_row_group_tables(partition.path)
            return
        import pyarrow as pa

        from deltacat_spark.sources import hudi_log

        blocks = hudi_log.read_blocks(partition.path)
        hudi_log.ensure_decodable(blocks, partition.path)
        for b in hudi_log.valid_data_blocks(blocks, {partition.instant}):
            rows = hudi_log.block_records(b)
            if rows:
                yield pa.Table.from_pylist(rows)

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint (the timeline is
        # immutable); remember the committed end as the pacing floor
        if self._floor is None or end["instant"] > self._floor:
            self._floor = end["instant"]
        if self._floor_dir:
            # persist so a restarted reader's FIRST latestOffset is
            # capped too; atomic rename — a torn write can't produce a
            # bogus floor
            os.makedirs(self._floor_dir, exist_ok=True)
            p = os.path.join(self._floor_dir, "hudi_pacing_floor.txt")
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                f.write(self._floor)
            os.replace(tmp, p)


class HudiIncrementalDataSource(DataSource):
    """`spark.readStream.format("dcs_hudi_incremental")` — register
    with `spark.dataSource.register(HudiIncrementalDataSource)` (done
    by `streaming.api.stream_read_hudi`). Options: root (or path),
    from_instant."""

    @classmethod
    def name(cls) -> str:
        return HUDI_FORMAT_NAME

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_type

        root = (
            self.options["path"]
            if "path" in self.options
            else self.options["root"]
        )
        fields = [
            StructField(name, from_arrow_type(atype))
            for name, atype in _hudi_data_fields(root)
        ]
        return StructType(fields + [StructField("_commit_instant", StringType())])

    def streamReader(self, schema: StructType) -> HudiIncrementalStreamReader:
        return HudiIncrementalStreamReader(self.options)


# ---------------------------------------------------------------------------
# Delta appends
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _DeltaAddPartition(InputPartition):
    path: str
    version: int
    partition_values: str  # JSON {col: string-or-null}


def _delta_schemas(root: str):
    """(full StructType incl. partition cols, partition col names,
    logical→physical name map).

    `ensure_readable()` runs here so the STREAM refuses
    unknown-readerFeature / deletion-vector tables as loudly as the
    batch reader does (ADVICE r11: only inline DV adds were guarded).
    Column mapping is SUPPORTED (r12): parquet columns and
    partitionValues resolve through `physicalName`, output stays
    logical — same contract as batch `read_delta`."""
    from deltacat_spark.sources.deltalake import DeltaSnapshot

    snap = DeltaSnapshot(root)
    snap.ensure_readable(allow_column_mapping=True)
    return snap.schema, snap.partition_columns, snap.physical_names()


class DeltaAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._root = options["path"] if "path" in options else options["root"]
        self._from = int(options.get("from_version", -1))
        self._on_remove = options.get("on_remove", "fail")
        from pyspark.sql.pandas.types import to_arrow_type

        sch, part_cols, phys = _delta_schemas(self._root)
        self._fields = [
            (
                f.name,
                to_arrow_type(f.dataType),
                f.name in set(part_cols),
                phys.get(f.name, f.name),
            )
            for f in sch.fields
        ]

    def initialOffset(self) -> dict:
        return {"version": self._from}

    def latestOffset(self) -> dict:
        from deltacat_spark.sources.deltalake import latest_version

        try:
            return {"version": latest_version(self._root)}
        except FileNotFoundError:
            return {"version": self._from}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from deltacat_spark.sources.deltalake import _log_path

        out: list[InputPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            path = _log_path(self._root, v)
            if not os.path.isfile(path):
                continue
            adds, removed = [], False
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "add" in action:
                        if action["add"].get("deletionVector"):
                            raise NotImplementedError(
                                "Delta deletion vectors are not "
                                "supported by the jar-free stream "
                                "reader"
                            )
                        # dataChange=false adds are reorganizations
                        # (OPTIMIZE) — no new rows to deliver
                        if action["add"].get("dataChange", True):
                            adds.append(action["add"])
                    elif "remove" in action:
                        # dataChange=false removes (OPTIMIZE) don't
                        # change table contents — an append stream
                        # ignores them, like delta-spark does
                        if action["remove"].get("dataChange", True):
                            removed = True
            if removed:
                if self._on_remove == "skip":
                    continue
                raise ValueError(
                    f"delta version {v} removes files (overwrite/rewrite); "
                    "an append stream cannot represent it — use "
                    "on_remove='skip' or the engine's CDC feed"
                )
            for a in adds:
                out.append(
                    _DeltaAddPartition(
                        path=os.path.join(self._root, a["path"]),
                        version=v,
                        partition_values=json.dumps(
                            a.get("partitionValues") or {}
                        ),
                    )
                )
        return out

    def read(self, partition: _DeltaAddPartition) -> Iterator["RecordBatch"]:
        import pyarrow as pa

        pv = json.loads(partition.partition_values)
        for t in _iter_row_group_tables(partition.path):
            n = len(t)
            if n == 0:
                continue
            cols, names = [], []
            for name, atype, is_part, phys in self._fields:
                # parquet columns and partitionValues are keyed by the
                # PHYSICAL name (column mapping); output stays logical
                if phys in t.column_names:
                    col = t[phys].cast(atype)
                elif is_part and phys in pv:
                    v = pv[phys]
                    col = (
                        pa.nulls(n, atype)
                        if v is None
                        else pa.array([v] * n, pa.string()).cast(atype)
                    )
                else:
                    col = pa.nulls(n, atype)
                cols.append(col)
                names.append(name)
            cols.append(pa.array([partition.version] * n, pa.int64()))
            names.append("_commit_version")
            yield from pa.table(cols, names=names).to_batches()

    def commit(self, end: dict) -> None:
        pass


@dataclasses.dataclass
class _IcebergAddPartition(InputPartition):
    path: str
    snapshot_id: int
    sequence_number: int
    partition_values: str  # JSON {col: string-or-null}


def _iceberg_schemas(root: str):
    """(full StructType incl. partition cols, partition col names)."""
    from deltacat_spark.sources.iceberg import (
        IcebergTable,
        current_schema,
        current_spec_fields,
        spark_schema_for,
    )

    meta = IcebergTable(root).metadata()
    if meta.get("format-version", 2) not in (2, 3):
        # the stream's offsets ARE sequence numbers (v3 keeps the v2
        # model, r14; DV commits surface as non-append snapshots)
        raise NotImplementedError(
            "the iceberg append stream needs a v2/v3 table; this table "
            f"is format-version {meta.get('format-version')}"
        )
    full = spark_schema_for(current_schema(meta))
    part_cols = [
        pf["name"]
        for pf in current_spec_fields(meta)
        if pf.get("transform", "identity") == "identity"
    ]
    return full, part_cols


class IcebergAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._root = options["path"] if "path" in options else options["root"]
        self._from = int(options.get("from_sequence", 0))
        self._on_non_append = options.get("on_non_append", "fail")
        from pyspark.sql.pandas.types import to_arrow_type

        sch, part_cols = _iceberg_schemas(self._root)
        self._fields = [
            (f.name, to_arrow_type(f.dataType), f.name in set(part_cols))
            for f in sch.fields
        ]

    def initialOffset(self) -> dict:
        return {"seq": self._from}

    def latestOffset(self) -> dict:
        from deltacat_spark.sources.iceberg import iceberg_history

        try:
            hist = iceberg_history(self._root)
        except FileNotFoundError:
            return {"seq": self._from}
        seqs = [h["sequence_number"] for h in hist]
        return {"seq": max(seqs) if seqs else self._from}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from deltacat_spark.sources.iceberg import IcebergTable

        tbl = IcebergTable(self._root)
        meta = tbl.metadata()
        out: list[InputPartition] = []
        for snap in sorted(
            meta.get("snapshots", []), key=lambda s: s["sequence-number"]
        ):
            seq = snap["sequence-number"]
            if not (int(start["seq"]) < seq <= int(end["seq"])):
                continue
            op = snap.get("summary", {}).get("operation")
            if op != "append":
                if self._on_non_append == "skip":
                    continue
                raise ValueError(
                    f"iceberg snapshot {snap['snapshot-id']} is "
                    f"{op!r}, not an append; the append stream cannot "
                    "represent rewrites/deletes — use "
                    "on_non_append='skip' or batch read_iceberg"
                )
            sid = snap["snapshot-id"]
            for mf in tbl.manifests(snap):
                if mf.get("content") == 1:
                    continue  # delete manifest — cannot appear under append
                for e in tbl.manifest_entries(mf["manifest_path"]):
                    # newly ADDED by this snapshot only (EXISTING entries
                    # were delivered when their own snapshot streamed)
                    if e["status"] != 1 or e.get("snapshot_id") != sid:
                        continue
                    df = e["data_file"]
                    from deltacat_spark.sources.iceberg import (
                        _abs_data_path,
                    )

                    out.append(
                        _IcebergAddPartition(
                            path=_abs_data_path(
                                self._root, df["file_path"]
                            ),
                            snapshot_id=sid,
                            sequence_number=seq,
                            partition_values=json.dumps(
                                {
                                    k: (None if v is None else str(v))
                                    for k, v in (
                                        df.get("partition") or {}
                                    ).items()
                                }
                            ),
                        )
                    )
        return out

    def read(self, partition: _IcebergAddPartition) -> Iterator["RecordBatch"]:
        import pyarrow as pa

        pv = json.loads(partition.partition_values)
        for t in _iter_row_group_tables(partition.path):
            n = len(t)
            if n == 0:
                continue
            cols, names = [], []
            for name, atype, is_part in self._fields:
                if name in t.column_names:
                    col = t[name].cast(atype)
                elif is_part and name in pv:
                    v = pv[name]
                    col = (
                        pa.nulls(n, atype)
                        if v is None
                        else pa.array([v] * n, pa.string()).cast(atype)
                    )
                else:
                    col = pa.nulls(n, atype)
                cols.append(col)
                names.append(name)
            cols.append(pa.array([partition.snapshot_id] * n, pa.int64()))
            names.append("_commit_snapshot_id")
            yield from pa.table(cols, names=names).to_batches()

    def commit(self, end: dict) -> None:
        pass


class IcebergAppendsDataSource(DataSource):
    """`spark.readStream.format("dcs_iceberg_appends")` — register with
    `spark.dataSource.register(IcebergAppendsDataSource)` (done by
    `streaming.api.stream_read_iceberg`). Options: root (or path),
    from_sequence, on_non_append."""

    @classmethod
    def name(cls) -> str:
        return ICEBERG_FORMAT_NAME

    def schema(self) -> StructType:
        root = (
            self.options["path"]
            if "path" in self.options
            else self.options["root"]
        )
        sch, _ = _iceberg_schemas(root)
        return StructType(
            list(sch.fields)
            + [StructField("_commit_snapshot_id", LongType())]
        )

    def streamReader(self, schema: StructType) -> IcebergAppendsStreamReader:
        return IcebergAppendsStreamReader(self.options)


class DeltaAppendsDataSource(DataSource):
    """`spark.readStream.format("dcs_delta_appends")` — register with
    `spark.dataSource.register(DeltaAppendsDataSource)` (done by
    `streaming.api.stream_read_delta`). Options: root (or path),
    from_version, on_remove."""

    @classmethod
    def name(cls) -> str:
        return DELTA_FORMAT_NAME

    def schema(self) -> StructType:
        root = (
            self.options["path"]
            if "path" in self.options
            else self.options["root"]
        )
        sch, _, _ = _delta_schemas(root)
        return StructType(
            list(sch.fields) + [StructField("_commit_version", LongType())]
        )

    def streamReader(self, schema: StructType) -> DeltaAppendsStreamReader:
        return DeltaAppendsStreamReader(self.options)
