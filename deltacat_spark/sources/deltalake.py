"""Jar-free Delta Lake table interop (read + write), from the published
Delta transaction-log protocol alone.

Why: the reference interops with lakehouse table formats through
connector sessions (`compute/converter/converter_session.py:46-429`
commits back to external tables; DatastoreType DELTA_LAKE in
`types/media.py:353-420`), and this sandbox ships no `delta-spark` jar
and no network for `--packages`. The Delta log, however, is plain
JSON + parquet per the public PROTOCOL.md — so the control plane is
implementable directly, with Spark's native parquet scan as the data
plane. This closes the "external table format round-trip" gap as far
as a jar-less environment allows: tables this module writes follow the
spec's on-disk layout (20-digit zero-padded JSON commits, add/remove/
metaData/protocol actions, checkpoint parquet + `_last_checkpoint`),
and tables written by any spec-compliant writer read back.

Scale shape:
- The data plane is one Spark parquet scan per *partition-value group*
  in the general case, or a SINGLE scan with `basePath` when the live
  files are hive-layout (`col=val/` path segments — what this module's
  own writer and Spark's partitionBy emit). Column pruning and filter
  pushdown stay native either way.
- The control plane (log replay) is driver-side and
  checkpoint-accelerated: O(commits since last checkpoint) JSON lines,
  not O(table size). Checkpoints are written every
  `CHECKPOINT_INTERVAL` commits like delta-spark's default.
- Partition pruning happens on the log (add.partitionValues) before
  any data file is touched; file skipping uses add.stats min/max.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from deltacat_spark.localdf import local_df

LOG_DIR = "_delta_log"
CHECKPOINT_INTERVAL = 10

# ---------------------------------------------------------------------------
# log plumbing
# ---------------------------------------------------------------------------


def _log_path(root: str, version: int) -> str:
    return os.path.join(root, LOG_DIR, f"{version:020d}.json")


def _ckpt_path(root: str, version: int) -> str:
    return os.path.join(root, LOG_DIR, f"{version:020d}.checkpoint.parquet")


def _list_versions(root: str) -> list[int]:
    d = os.path.join(root, LOG_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.endswith(".json") and len(f) == 25:
            try:
                out.append(int(f[:20]))
            except ValueError:
                pass
    return sorted(out)


def latest_version(root: str) -> int:
    vs = _list_versions(root)
    if not vs:
        raise FileNotFoundError(f"no Delta log under {root}/{LOG_DIR}")
    return vs[-1]


def version_at(root: str, timestamp_ms: int) -> int:
    """Time travel by TIMESTAMP (`timestampAsOf`): the newest version
    whose commit timestamp <= the instant. Resolved from each commit's
    in-log `commitInfo.timestamp` (deterministic, travels with the
    table) with the log file's mtime as fallback for commits written
    without commitInfo."""
    best = None
    for v in _list_versions(root):
        ts = None
        with open(_log_path(root, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "commitInfo" in a and a["commitInfo"].get("timestamp"):
                    ts = int(a["commitInfo"]["timestamp"])
                    break
        if ts is None:
            ts = int(os.path.getmtime(_log_path(root, v)) * 1000)
        if ts <= timestamp_ms:
            best = v
    if best is None:
        raise ValueError(
            f"no delta version at or before timestamp {timestamp_ms}"
        )
    return best


class DeltaSnapshot:
    """Live state of a Delta table at a version: metadata + add map."""

    def __init__(self, root: str, version: int | None = None):
        self.root = root
        versions = _list_versions(root)
        if not versions:
            raise FileNotFoundError(f"no Delta log under {root}/{LOG_DIR}")
        self.version = versions[-1] if version is None else version
        if self.version not in versions:
            raise ValueError(
                f"version {self.version} not in log (have "
                f"{versions[0]}..{versions[-1]})"
            )
        self.metadata: dict[str, Any] = {}
        self.protocol: dict[str, Any] = {}
        self.txns: dict[str, int] = {}  # appId -> latest txn version
        adds: dict[str, dict] = {}

        start = 0
        ckpt_v = self._usable_checkpoint(self.version)
        if ckpt_v is not None:
            for action in self._read_checkpoint(ckpt_v):
                self._apply(action, adds)
            start = ckpt_v + 1
        for v in versions:
            if v < start or v > self.version:
                continue
            with open(_log_path(root, v)) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self._apply(json.loads(line), adds)
        if not self.metadata:
            raise ValueError("Delta log has no metaData action")
        self.adds = adds

    def _checkpoint_candidates(self) -> dict[int, list[str]]:
        """All COMPLETE checkpoints in the log dir, by the spec's three
        file layouts (r14 — delta-spark 3.x tables stop refusing):

        - classic single-file  `N.checkpoint.parquet`
        - classic multi-part   `N.checkpoint.{part}.{parts}.parquet`
          (10-digit 1-based part numbers; usable only when every part
          of the set is present)
        - v2 UUID-named        `N.checkpoint.{uniqueStr}.{parquet|json}`
          (top-level file; `sidecar` actions inside point into
          `_delta_log/_sidecars/`)

        Returns version → ordered file list. Preference at the same
        version: classic > v2 > multi-part (all reconstruct the same
        state; classic is what this writer emits)."""
        d = os.path.join(self.root, LOG_DIR)
        classic: dict[int, list[str]] = {}
        v2: dict[int, list[str]] = {}
        # version → declared part count → part number → path: part
        # files are tracked PER (version, num_parts) set, so a retried
        # writer's leftover parts from a different part count never
        # disqualify a complete set
        multi: dict[int, dict[int, dict[int, str]]] = {}
        for f in os.listdir(d):
            parts = f.split(".")
            if len(parts) < 3 or parts[1] != "checkpoint":
                continue
            try:
                v = int(parts[0])
            except ValueError:
                continue
            full = os.path.join(d, f)
            if len(parts) == 3 and parts[2] == "parquet":
                classic[v] = [full]
            elif (
                len(parts) == 5
                and parts[4] == "parquet"
                and len(parts[2]) == 10
                and len(parts[3]) == 10
                and parts[2].isdigit()
                and parts[3].isdigit()
            ):
                multi.setdefault(v, {}).setdefault(int(parts[3]), {})[
                    int(parts[2])
                ] = full
            elif len(parts) == 4 and parts[3] in ("parquet", "json"):
                v2[v] = [full]
        out: dict[int, list[str]] = {}
        for v, sets in multi.items():
            for n, got in sorted(sets.items()):
                if set(got) == set(range(1, n + 1)):
                    out[v] = [got[i] for i in range(1, n + 1)]
                    break  # any complete set reconstructs the state
        out.update(v2)
        out.update(classic)
        return out

    def _usable_checkpoint(self, upto: int) -> int | None:
        ok = [v for v in self._checkpoint_candidates() if v <= upto]
        return max(ok) if ok else None

    @staticmethod
    def _undict(v):
        # arrow map columns come back as [(k, v), ...]
        if isinstance(v, list) and all(
            isinstance(x, tuple) and len(x) == 2 for x in v
        ):
            return dict(v)
        if isinstance(v, dict):
            return {k: DeltaSnapshot._undict(x) for k, x in v.items()}
        return v

    def _ckpt_file_actions(self, path: str):
        """Raw action dicts of one checkpoint (or sidecar) file —
        parquet rows or (v2 json checkpoints) json-lines."""
        if path.endswith(".json"):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield json.loads(line)
            return
        import pyarrow.parquet as pq

        for row in pq.read_table(path).to_pylist():
            yield {
                k: self._undict(v)
                for k, v in row.items()
                if v is not None
            }

    def _read_checkpoint(self, version: int):
        """Replayable actions of the checkpoint at `version`,
        resolving multi-part unions and v2 sidecar references."""
        files = self._checkpoint_candidates()[version]
        sidecar_dir = os.path.join(self.root, LOG_DIR, "_sidecars")
        for path in files:
            for action in self._ckpt_file_actions(path):
                cm = action.get("checkpointMetadata")
                if cm is not None:
                    if int(cm.get("version", version)) != version:
                        raise ValueError(
                            f"v2 checkpoint {os.path.basename(path)} "
                            f"carries checkpointMetadata.version "
                            f"{cm.get('version')} != {version}"
                        )
                    continue
                sc = action.get("sidecar")
                if sc is not None:
                    rel = sc["path"]
                    sp = (
                        rel
                        if os.path.isabs(rel)
                        else os.path.join(sidecar_dir, rel)
                    )
                    if not os.path.isfile(sp):
                        raise ValueError(
                            f"v2 checkpoint sidecar missing: {rel}"
                        )
                    for sub in self._ckpt_file_actions(sp):
                        for key in ("add", "remove"):
                            if sub.get(key) is not None:
                                yield {key: sub[key]}
                    continue
                for key in ("metaData", "protocol", "add", "remove", "txn"):
                    if action.get(key) is not None:
                        yield {key: action[key]}

    @staticmethod
    def _clean(d: dict) -> dict:
        return {k: v for k, v in d.items() if v is not None}

    def _apply(self, action: dict, adds: dict[str, dict]) -> None:
        if "metaData" in action and action["metaData"]:
            self.metadata = self._clean(action["metaData"])
        elif "protocol" in action and action["protocol"]:
            self.protocol = self._clean(action["protocol"])
        elif "add" in action and action["add"]:
            a = self._clean(action["add"])
            adds[a["path"]] = a
        elif "remove" in action and action["remove"]:
            adds.pop(action["remove"]["path"], None)
        elif "txn" in action and action["txn"]:
            t = action["txn"]
            v = int(t["version"])
            if v > self.txns.get(t["appId"], -1):
                self.txns[t["appId"]] = v

    # -- schema ----------------------------------------------------------
    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.metadata["schemaString"]))

    @property
    def partition_columns(self) -> list[str]:
        return list(self.metadata.get("partitionColumns") or [])

    @property
    def data_schema(self) -> T.StructType:
        parts = set(self.partition_columns)
        return T.StructType([f for f in self.schema.fields if f.name not in parts])

    @property
    def column_mapping_mode(self) -> str:
        conf = self.metadata.get("configuration") or {}
        return conf.get("delta.columnMapping.mode", "none") or "none"

    def physical_names(self) -> dict[str, str]:
        """logical column → physical parquet column (PROTOCOL.md column
        mapping: `delta.columnMapping.physicalName` in each field's
        schemaString metadata; identity when mapping is off). Under
        BOTH 'name' and 'id' modes delta writers name the parquet
        columns by physicalName, so the rename-based read works for
        either. Nested struct fields carry their own mapping — not
        implemented, refused loudly."""
        raw = json.loads(self.metadata["schemaString"])
        out: dict[str, str] = {}
        mapped = self.column_mapping_mode not in ("", "none")
        for f in raw.get("fields", []):
            md = f.get("metadata") or {}
            phys = md.get("delta.columnMapping.physicalName")
            if mapped and isinstance(f.get("type"), dict):
                raise NotImplementedError(
                    "Delta column mapping over nested struct/array/map "
                    "columns is not supported by the jar-free reader"
                )
            if mapped and not phys:
                # the protocol REQUIRES physicalName once mapping is
                # on; guessing the logical name would misread a real
                # mapped table
                raise ValueError(
                    f"Delta column mapping is enabled but field "
                    f"{f['name']!r} has no "
                    "delta.columnMapping.physicalName metadata"
                )
            out[f["name"]] = phys if mapped else f["name"]
        return out

    def live_files(self) -> list[dict]:
        return sorted(self.adds.values(), key=lambda a: a["path"])

    # reader features this jar-free implementation actually honors —
    # anything else in a v3 protocol's readerFeatures must FAIL LOUDLY
    # rather than silently misread an external table. v2Checkpoint is
    # honored since r14: snapshot replay reads UUID-named top-level
    # checkpoints + sidecars (`_checkpoint_candidates`).
    _SUPPORTED_READER_FEATURES = {"timestampNtz", "v2Checkpoint"}

    def ensure_readable(
        self,
        allow_deletion_vectors: bool = False,
        allow_column_mapping: bool = False,
    ) -> None:
        """Refuse external tables whose protocol features this reader
        would silently misread: any unknown v3 readerFeature, and —
        unless the caller handles them (`read_delta` does both) —
        column mapping (physical names differ from logical) and
        deletion vectors (deleted rows would reappear)."""
        supported = set(self._SUPPORTED_READER_FEATURES)
        if allow_deletion_vectors:
            supported.add("deletionVectors")
        if allow_column_mapping:
            supported.add("columnMapping")
        feats = set(self.protocol.get("readerFeatures") or [])
        unsupported = feats - supported
        if unsupported:
            raise NotImplementedError(
                "Delta reader features not supported by the jar-free "
                f"reader: {sorted(unsupported)}"
            )
        mode = self.column_mapping_mode
        if mode not in ("", "none"):
            if not allow_column_mapping:
                raise NotImplementedError(
                    f"Delta column mapping mode {mode!r} is not "
                    "supported on this path (physical column names "
                    "would be misread); use read_delta"
                )
            self.physical_names()  # raises on nested mapped columns
        if not allow_deletion_vectors:
            for a in self.adds.values():
                if a.get("deletionVector"):
                    raise NotImplementedError(
                        "Delta deletion vectors are not supported on "
                        "this path (deleted rows would reappear); use "
                        "read_delta, which applies them"
                    )


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def read_delta(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    partition_filter: Callable[[dict[str, str]], bool] | dict[str, str] | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Delta table → DataFrame (time travel via `version` or
    `timestamp_ms` — delta's timestampAsOf, resolved from commitInfo
    timestamps).

    `partition_filter`: dict = equality match on partitionValues
    strings, callable = arbitrary predicate over the partitionValues
    dict. Pruning is a log-side (driver, metadata-only) operation — a
    pruned partition's data files are never listed in the scan.

    Deletion vectors (PROTOCOL.md) are APPLIED: each DV'd file's
    descriptor decodes executor-side (`sources/deltadv.py`, one
    `mapInPandas` row per file emitting bounded (path, pos) batches)
    and the positions anti-join against Spark's `_metadata.row_index`
    — the same shape as the Iceberg position-delete path.
    """
    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp_ms, not both")
        version = version_at(root, timestamp_ms)
    snap = DeltaSnapshot(root, version)
    snap.ensure_readable(
        allow_deletion_vectors=True, allow_column_mapping=True
    )
    mapped = snap.column_mapping_mode not in ("", "none")
    physical = snap.physical_names() if mapped else None
    files = snap.live_files()
    if partition_filter is not None:
        if isinstance(partition_filter, dict):
            # dict filters use LOGICAL column names; partitionValues
            # are physical-keyed under column mapping — translate
            want = {
                (physical or {}).get(k, k): v
                for k, v in partition_filter.items()
            }

            def _keep(pv: dict[str, str]) -> bool:
                return all(pv.get(k) == v for k, v in want.items())

        else:
            # callable filters see the RAW partitionValues dict
            # (physical-keyed on mapped tables)
            _keep = partition_filter
        files = [f for f in files if _keep(f.get("partitionValues") or {})]

    pos_df = _dv_positions_frame(spark, root, files)
    df = _scan_files(
        spark, root, snap.schema, snap.partition_columns, files,
        lineage=pos_df is not None, physical=physical,
    )
    if pos_df is not None:
        df = df.join(
            pos_df, ["__delta_fp", "__delta_pos"], "left_anti"
        ).drop("__delta_fp", "__delta_pos")
    return df


def _dv_positions_frame(
    spark: SparkSession, root: str, files: list[dict]
) -> "DataFrame | None":
    """(__delta_fp, __delta_pos) of every DELETION-VECTOR-deleted row
    across `files` — descriptors decode EXECUTOR-side (one mapInPandas
    row per DV'd file emitting bounded position batches), ready to
    anti-join against lineage columns. None when no file carries a
    DV."""
    dv_rows = [
        (f["path"], json.dumps(f["deletionVector"]))
        for f in files
        if f.get("deletionVector")
    ]
    if not dv_rows:
        return None
    desc_df = local_df(spark,
        dv_rows, "__delta_fp string, __dv string"
    )
    table_root = root

    def _decode(batches):
        import pandas as pd

        from deltacat_spark.sources import deltadv

        for pdf in batches:
            for fp, dv in zip(pdf["__delta_fp"], pdf["__dv"]):
                desc = json.loads(dv)
                for chunk in deltadv.iter_descriptor_position_batches(
                    table_root, desc
                ):
                    yield pd.DataFrame(
                        {
                            "__delta_fp": fp,
                            "__delta_pos": pd.Series(
                                chunk, dtype="int64"
                            ),
                        }
                    )

    return desc_df.mapInPandas(
        _decode, "__delta_fp string, __delta_pos long"
    )


def _scan_files(
    spark: SparkSession,
    root: str,
    full_schema: T.StructType,
    part_cols: list[str],
    files: list[dict],
    lineage: bool = False,
    physical: "dict[str, str] | None" = None,
) -> DataFrame:
    """Scan a log-selected file list, reconstructing identity partition
    columns from `partitionValues` (hive fast path when the layout
    allows ONE scan). `lineage=True` appends `__delta_fp`
    (root-relative path) and `__delta_pos` (row index) — the
    coordinates deletion vectors key on. `physical` maps logical →
    physical column names (Delta column mapping): parquet reads use
    physical names and rename back; partitionValues are keyed by
    physical names per the protocol."""
    phys = physical or {}

    def p(c: str) -> str:
        return phys.get(c, c)

    data_schema = T.StructType(
        [
            T.StructField(p(f.name), f.dataType, f.nullable)
            for f in full_schema.fields
            if f.name not in part_cols
        ]
    )
    renames = {
        p(f.name): f.name
        for f in full_schema.fields
        if f.name not in part_cols and p(f.name) != f.name
    }
    keep = [f.name for f in full_schema.fields]
    if lineage:
        keep = keep + ["__delta_fp", "__delta_pos"]

    def _with_lineage(df: DataFrame) -> DataFrame:
        if not lineage:
            return df
        rel = F.replace(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/*", "/"
            ),
            F.lit(root.rstrip("/") + "/"),
            F.lit(""),
        )
        return df.withColumn("__delta_fp", rel).withColumn(
            "__delta_pos", F.col("_metadata.row_index")
        )

    def _renamed(df: DataFrame) -> DataFrame:
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return df

    if not files:
        df = local_df(spark, [], full_schema)
        if lineage:
            df = df.withColumn(
                "__delta_fp", F.lit(None).cast("string")
            ).withColumn("__delta_pos", F.lit(None).cast("long"))
        return df
    paths = [os.path.join(root, f["path"]) for f in files]

    if not part_cols:
        return _renamed(
            _with_lineage(spark.read.schema(data_schema).parquet(*paths))
        ).select(*keep)

    # hive-layout fast path: every live file carries its partition
    # values in the path → ONE scan, Spark reconstructs the columns
    # (mapped tables take the general path: their partitionValues are
    # keyed by physical names that never appear as hive segments here)
    if physical is None and all(
        all(f"{c}={_hive_quote(f.get('partitionValues', {}).get(c))}" in f["path"]
            for c in part_cols)
        for f in files
    ):
        df = _with_lineage(
            spark.read.schema(data_schema)
            .option("basePath", root)
            .parquet(*paths)
        )
        for c in part_cols:
            df = df.withColumn(
                c, F.col(c).cast(dict_field_type(full_schema, c))
            )
        return df.select(*keep)

    # general layout: group files by partition tuple, one scan per group
    groups: dict[tuple, list[str]] = {}
    pv_by_key: dict[tuple, dict[str, str]] = {}
    for f in files:
        pv = f.get("partitionValues") or {}
        key = tuple(pv.get(p(c)) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(root, f["path"]))
        pv_by_key[key] = pv
    out = None
    # None-safe ordering: partitionValues entries may be null
    for key, group_paths in sorted(
        groups.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    ):
        df = _renamed(
            _with_lineage(
                spark.read.schema(data_schema).parquet(*group_paths)
            )
        )
        pv = pv_by_key[key]
        for c in part_cols:
            raw = pv.get(p(c))
            df = df.withColumn(
                c,
                F.lit(raw).cast(dict_field_type(full_schema, c)),
            )
        df = df.select(*keep)
        out = df if out is None else out.unionByName(df)
    return out


def _hive_quote(v: str | None) -> str:
    from urllib.parse import quote

    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    return quote(v, safe="")


def dict_field_type(schema: T.StructType, name: str) -> T.DataType:
    for f in schema.fields:
        if f.name == name:
            return f.dataType
    raise KeyError(name)


def delta_history(root: str) -> list[dict[str, Any]]:
    """commitInfo per version (the `DESCRIBE HISTORY` surface)."""
    out = []
    for v in _list_versions(root):
        info: dict[str, Any] = {"version": v}
        with open(_log_path(root, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "commitInfo" in a:
                    info.update(a["commitInfo"])
        out.append(info)
    return out


def read_delta_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change feed reconstructed from the action log — the
    `table_changes` surface for a Delta table without CDC files:
    `dataChange=true` adds replay as `insert` rows, `dataChange=true`
    removes replay as `delete` rows (the removed file re-read as of the
    PRE-commit snapshot), and reorganizations (OPTIMIZE's
    `dataChange=false` adds+removes) are correctly silent. Stamps
    `_change_type` and `_commit_version`.

    DELETION-VECTOR commits are exact too (r12): a remove+re-add pair
    whose new add carries a DV replays as delete rows at exactly the
    POSITION DIFF new-DV \\ old-DV (never the whole file); whole-file
    removes and inserts on a DV'd table apply the file's prior/own DV
    so previously-deleted rows never re-surface in the feed.

    CDC FILES (r13): a commit carrying `cdc` actions (the protocol's
    "Add CDC File" — `_change_data/` parquet with a `_change_type`
    column, what delta-spark writes for UPDATE/MERGE under
    `delta.enableChangeDataFeed`) serves its feed from them
    EXCLUSIVELY, so partial-file rewrites surface only their changed
    rows (update_preimage/update_postimage), never the carried
    unchanged rows. `update_delta` produces this shape. Exact for any
    writer whose data-changing commits are whole-file, DV diffs, or
    CDC-described — the delta-spark CDF contract.

    Versions are inclusive on both ends. Raises if a needed removed
    or CDC file was vacuumed away."""
    from deltacat_spark.sources import deltadv

    vs = _list_versions(root)
    if not vs:
        raise FileNotFoundError(f"no Delta log under {root}/{LOG_DIR}")
    hi = vs[-1] if to_version is None else to_version
    DeltaSnapshot(root, hi).ensure_readable(
        allow_deletion_vectors=True, allow_column_mapping=True
    )
    want = [v for v in vs if from_version <= v <= hi]
    out = None

    def _phys(snapshot) -> "dict[str, str] | None":
        if snapshot.column_mapping_mode in ("", "none"):
            return None
        return snapshot.physical_names()

    def _stamp(df: DataFrame, kind: str, v: int) -> DataFrame:
        return df.withColumn("_change_type", F.lit(kind)).withColumn(
            "_commit_version", F.lit(v).cast("long")
        )

    def _dv_positions(fmeta: dict | None) -> set[int]:
        if not fmeta or not fmeta.get("deletionVector"):
            return set()
        return set(
            deltadv.descriptor_positions(root, fmeta["deletionVector"])
        )

    def _rows_at(snapshot, fmeta: dict, positions: set[int], keep: bool):
        """Rows of one file AT (keep=True) or EXCLUDING (keep=False)
        the given positions."""
        df = _scan_files(
            spark, root, snapshot.schema, snapshot.partition_columns,
            [fmeta], lineage=True, physical=_phys(snapshot),
        )
        if not positions:
            return df.drop("__delta_fp", "__delta_pos")
        pos_df = local_df(spark,
            [(int(p),) for p in sorted(positions)], "__delta_pos long"
        )
        how = "left_semi" if keep else "left_anti"
        return df.join(F.broadcast(pos_df), "__delta_pos", how).drop(
            "__delta_fp", "__delta_pos"
        )

    for v in want:
        adds: list[dict] = []
        removes: list[dict] = []
        cdcs: list[dict] = []
        with open(_log_path(root, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if a.get("cdc"):
                    cdcs.append(a["cdc"])
                elif a.get("add") and a["add"].get("dataChange", True):
                    adds.append(a["add"])
                elif a.get("remove") and a["remove"].get(
                    "dataChange", True
                ):
                    removes.append(a["remove"])
        if cdcs:
            # protocol "Add CDC File": when a commit carries cdc
            # actions they hold the COMPLETE row-level changes for the
            # commit (incl. inserts for mixed MERGE commits) — serve
            # the feed from them EXCLUSIVELY; the add/remove pairs of
            # the same commit are the rewritten files and must stay
            # silent (whole-file diffing them would surface unchanged
            # rows as delete+insert noise)
            for c in cdcs:
                if not os.path.isfile(os.path.join(root, c["path"])):
                    raise ValueError(
                        f"change feed at version {v} needs CDC file "
                        f"{c['path']} which vacuum has deleted"
                    )
            snap_cdc = DeltaSnapshot(root, v)
            feed_schema = T.StructType(
                list(snap_cdc.schema.fields)
                + [T.StructField("_change_type", T.StringType(), False)]
            )
            df = _scan_files(
                spark,
                root,
                feed_schema,
                snap_cdc.partition_columns,
                cdcs,
                physical=_phys(snap_cdc),
            )
            part = df.withColumn(
                "_commit_version", F.lit(v).cast("long")
            )
            out = part if out is None else out.unionByName(part)
            continue
        prev = DeltaSnapshot(root, v - 1) if v > vs[0] else None
        snap_v = DeltaSnapshot(root, v) if (adds or removes) else None
        add_by_path = {a["path"]: a for a in adds}
        # a remove whose path is re-added WITH a DV in the same commit
        # is a DV update, not a whole-file delete
        dv_update_paths = {
            p
            for p in add_by_path
            if add_by_path[p].get("deletionVector")
            and any(r["path"] == p for r in removes)
            and prev is not None
            and p in prev.adds
        }
        # whole-file deletes: batch the DV-less files into ONE scan
        # (the common overwrite shape); DV'd files filter per-file
        plain_rfiles: list[dict] = []
        for r in removes:
            if r["path"] in dv_update_paths or prev is None:
                continue
            fmeta = prev.adds.get(r["path"])
            if fmeta is None:
                continue  # re-remove of an already-dead file
            if not os.path.isfile(os.path.join(root, r["path"])):
                raise ValueError(
                    f"change feed at version {v} needs removed file "
                    f"{r['path']} which vacuum has deleted"
                )
            if fmeta.get("deletionVector"):
                # rows live BEFORE the commit: exclude the prior DV
                df = _rows_at(
                    prev, fmeta, _dv_positions(fmeta), keep=False
                )
                part = _stamp(df, "delete", v)
                out = part if out is None else out.unionByName(part)
            else:
                plain_rfiles.append(fmeta)
        if plain_rfiles:
            df = _scan_files(
                spark, root, prev.schema, prev.partition_columns,
                plain_rfiles, physical=_phys(prev),
            )
            part = _stamp(df, "delete", v)
            out = part if out is None else out.unionByName(part)

        plain_adds: list[dict] = []
        for a in adds:
            if not os.path.isfile(os.path.join(root, a["path"])):
                raise ValueError(
                    f"change feed at version {v} needs file "
                    f"{a['path']} which vacuum has deleted"
                )
            if a["path"] in dv_update_paths:
                # DV update: delete rows = position diff new \ old
                old_pos = _dv_positions(prev.adds.get(a["path"]))
                new_pos = _dv_positions(a)
                newly = new_pos - old_pos
                if newly:
                    df = _rows_at(snap_v, a, newly, keep=True)
                    part = _stamp(df, "delete", v)
                    out = (
                        part if out is None else out.unionByName(part)
                    )
                continue
            if a.get("deletionVector"):
                # a brand-new file carrying a DV at add time inserts
                # only its live rows
                df = _rows_at(snap_v, a, _dv_positions(a), keep=False)
                part = _stamp(df, "insert", v)
                out = part if out is None else out.unionByName(part)
            else:
                plain_adds.append(a)
        if plain_adds:
            df = _scan_files(
                spark, root, snap_v.schema, snap_v.partition_columns,
                plain_adds, physical=_phys(snap_v),
            )
            part = _stamp(df, "insert", v)
            out = part if out is None else out.unionByName(part)
    if out is None:
        snap = DeltaSnapshot(root)
        return _stamp(local_df(spark, [], snap.schema), "insert", 0).filter(
            F.lit(False)
        )
    return out


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------


def write_delta(
    df: DataFrame,
    root: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    txn: "tuple[str, int] | None" = None,
    column_mapping: str | None = None,
) -> int:
    """DataFrame → Delta table; returns the committed version.

    append = new add actions; overwrite = adds + removes for every
    previously-live file. First commit also writes protocol+metaData.
    `txn=(app_id, version)` stamps a SetTransaction action in the same
    commit — the spec's idempotent-writer handshake: a streaming sink
    records its epoch here and skips any batch at or below the table's
    recorded version on replay (`latest_txn_version`).
    Data files go through Spark's parquet writer into a staging dir and
    are MOVED into the table root (partition-relative layout preserved)
    before the log commit — readers never see uncommitted files because
    only the log defines liveness.

    `column_mapping="name"` (table creation only) creates the table
    with COLUMN MAPPING: every field gets `delta.columnMapping.id` +
    a GUID `delta.columnMapping.physicalName` in the schemaString,
    parquet files carry the PHYSICAL column names, partitionValues key
    on physical names, and the protocol stamps reader 2 / writer 5 —
    the external delta-spark mapped-table shape. Appends/overwrites to
    a mapped table translate automatically (pass nothing).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if column_mapping not in (None, "none", "name"):
        raise ValueError(
            f"column_mapping must be None|'none'|'name', got "
            f"{column_mapping!r} ('id' mode writes are not implemented)"
        )
    os.makedirs(os.path.join(root, LOG_DIR), exist_ok=True)
    versions = _list_versions(root)
    prev = DeltaSnapshot(root) if versions else None
    version = (versions[-1] + 1) if versions else 0
    if prev is not None and column_mapping not in (None, "none"):
        if prev.column_mapping_mode in ("", "none"):
            raise ValueError(
                "column_mapping applies at table creation; use "
                "enable_column_mapping(root) to upgrade an existing "
                "table"
            )

    if partition_by is not None:
        part_cols = list(partition_by)
    else:
        part_cols = prev.partition_columns if prev else []

    # column mapping: data files and partitionValues use PHYSICAL names
    phys: dict[str, str] = {}
    mapped_schema_json: str | None = None
    if prev is not None and prev.column_mapping_mode not in ("", "none"):
        prev.ensure_readable(
            allow_deletion_vectors=True, allow_column_mapping=True
        )
        phys = prev.physical_names()
    elif prev is None and column_mapping == "name":
        mapped_schema_json, phys = _mapped_schema(df.schema)
    if phys:
        missing = [c for c in df.columns if c not in phys]
        if missing:
            raise ValueError(
                f"columns {missing} not in the mapped table schema"
            )
        for c in df.columns:
            if phys[c] != c:
                df = df.withColumnRenamed(c, phys[c])
    staged_part_cols = [phys.get(c, c) for c in part_cols]
    if prev is not None and part_cols != prev.partition_columns:
        raise ValueError(
            f"partition columns {part_cols} != table's "
            f"{prev.partition_columns}"
        )

    # stage data files with Spark's writer, then move into the root
    now_ms = int(time.time() * 1000)
    adds = [
        {"add": a}
        for a in _stage_files(
            df, root, staged_part_cols, max_records_per_file
        )
    ]

    actions: list[dict] = []
    if prev is None:
        if column_mapping == "name":
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 2,
                        "minWriterVersion": 5,
                    }
                }
            )
            config = {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": str(
                    len(df.schema.fields)
                ),
            }
            schema_string = mapped_schema_json
        else:
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 2,
                    }
                }
            )
            config = {}
            schema_string = df.schema.json()
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": part_cols,
                    "configuration": config,
                    "createdTime": now_ms,
                }
            }
        )
    removes = []
    if mode == "overwrite" and prev is not None:
        for f in prev.live_files():
            removes.append(
                {
                    "remove": {
                        "path": f["path"],
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    actions.extend(adds)
    actions.extend(removes)
    if txn is not None:
        actions.append(
            {
                "txn": {
                    "appId": str(txn[0]),
                    "version": int(txn[1]),
                    "lastUpdated": now_ms,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
                "engineInfo": "deltacat_spark-native",
            }
        }
    )

    tmp = _log_path(root, version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    # the log file IS the commit: O_EXCL-like loser detection via link
    final = _log_path(root, version)
    try:
        os.link(tmp, final)
    except FileExistsError:
        os.remove(tmp)
        raise RuntimeError(
            f"concurrent Delta commit at version {version}; retry"
        )
    os.remove(tmp)

    if version > 0 and version % CHECKPOINT_INTERVAL == 0:
        try:
            write_checkpoint(root, version)
        except Exception:
            pass  # checkpoints accelerate replay; never a commit failure
    return version


def _mapped_schema(spark_schema: T.StructType) -> tuple[str, dict[str, str]]:
    """schemaString JSON with column-mapping field metadata (GUID
    physicalName + sequential id per PROTOCOL.md) and the
    logical→physical map. Nested struct/array/map columns refuse — the
    jar-free reader doesn't map nested fields either."""
    raw = json.loads(spark_schema.json())
    phys: dict[str, str] = {}
    for i, f in enumerate(raw["fields"]):
        if isinstance(f.get("type"), dict):
            raise NotImplementedError(
                "column mapping over nested struct/array/map columns "
                "is not supported by this writer"
            )
        pname = f"col-{uuid.uuid4()}"
        md = dict(f.get("metadata") or {})
        md["delta.columnMapping.id"] = i + 1
        md["delta.columnMapping.physicalName"] = pname
        f["metadata"] = md
        phys[f["name"]] = pname
    return json.dumps(raw), phys


def enable_column_mapping(root: str) -> int:
    """Upgrade an existing table to column mapping mode 'name' — the
    delta-spark ALTER TABLE SET TBLPROPERTIES shape: EXISTING columns
    keep their display name as physicalName (so every live file still
    reads; this is what delta-spark does on upgrade), the protocol
    bumps to reader 2 / writer 5, and future columns get GUID physical
    names. Returns the committed version."""
    snap = DeltaSnapshot(root)
    if snap.column_mapping_mode not in ("", "none"):
        return snap.version  # already mapped
    raw = json.loads(snap.metadata["schemaString"])
    for i, f in enumerate(raw["fields"]):
        if isinstance(f.get("type"), dict):
            raise NotImplementedError(
                "column mapping over nested struct/array/map columns "
                "is not supported by this writer"
            )
        md = dict(f.get("metadata") or {})
        md["delta.columnMapping.id"] = i + 1
        md["delta.columnMapping.physicalName"] = f["name"]
        f["metadata"] = md
    md_action = dict(snap.metadata)
    cfg = dict(md_action.get("configuration") or {})
    cfg["delta.columnMapping.mode"] = "name"
    cfg["delta.columnMapping.maxColumnId"] = str(len(raw["fields"]))
    md_action["configuration"] = cfg
    md_action["schemaString"] = json.dumps(raw)
    proto = dict(snap.protocol or {})
    proto["minReaderVersion"] = max(
        2, int(proto.get("minReaderVersion") or 1)
    )
    prior_writer = int(proto.get("minWriterVersion") or 2)
    if prior_writer >= 7:
        proto["writerFeatures"] = sorted(
            set(proto.get("writerFeatures") or []) | {"columnMapping"}
        )
        if int(proto.get("minReaderVersion") or 1) >= 3:
            proto["readerFeatures"] = sorted(
                set(proto.get("readerFeatures") or []) | {"columnMapping"}
            )
    else:
        proto["minWriterVersion"] = max(5, prior_writer)
    actions = [
        {"protocol": proto},
        {"metaData": md_action},
        {
            "commitInfo": {
                "timestamp": int(time.time() * 1000),
                "operation": "SET TBLPROPERTIES",
                "operationParameters": {
                    "properties": '{"delta.columnMapping.mode":"name"}'
                },
                "engineInfo": "deltacat_spark-native",
            }
        },
    ]
    return _commit_actions(root, snap.version + 1, actions)


def _stage_files(
    df: DataFrame,
    root: str,
    part_cols: list[str],
    max_records_per_file: int,
    prefix: str = "",
) -> list[dict]:
    """Stage `df` through Spark's parquet writer and MOVE the files
    into the table root (under `prefix/` when given, e.g.
    `_change_data`), partition-relative layout preserved — readers
    never see them until the log commit. Returns add-shaped dicts
    (path/partitionValues/size/modificationTime/dataChange/stats)."""
    staging = os.path.join(root, f".staging-{uuid.uuid4().hex[:12]}")
    writer = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(staging)

    adds: list[dict] = []
    now_ms = int(time.time() * 1000)
    seen_names: set[str] = set()
    for dirpath, _, files in sorted(os.walk(staging)):
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, fname)
            rel_dir = os.path.relpath(dirpath, staging)
            rel_dir = "" if rel_dir == "." else rel_dir
            # partitionBy reuses one task filename across partition
            # dirs; basenames stay unique table-wide for sanity
            if fname in seen_names:
                fname = f"d{len(adds):05d}-{fname}"
            seen_names.add(fname)
            rel = os.path.join(rel_dir, fname) if rel_dir else fname
            if prefix:
                rel = os.path.join(prefix, rel)
            dst = os.path.join(root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
            pv = _partition_values(rel_dir)
            stats = _delta_stats(dst)
            if stats.get("numRecords") == 0:
                os.remove(dst)
                continue
            adds.append(
                {
                    "path": rel.replace(os.sep, "/"),
                    "partitionValues": pv,
                    "size": os.path.getsize(dst),
                    "modificationTime": now_ms,
                    "dataChange": True,
                    "stats": json.dumps(stats),
                }
            )
    shutil.rmtree(staging, ignore_errors=True)
    return adds


def _partition_values(rel_dir: str) -> dict[str, str | None]:
    from urllib.parse import unquote

    out: dict[str, str | None] = {}
    if not rel_dir:
        return out
    for seg in rel_dir.split(os.sep):
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    return out


def _delta_stats(path: str) -> dict[str, Any]:
    """Per-file stats in Delta's JSON shape (numRecords + min/max/null
    counts for top-level stats-typed columns) from the parquet footer."""
    from deltacat_spark.catalog.io import _footer_stats

    fs = _footer_stats(path)
    out: dict[str, Any] = {"numRecords": fs.get("records", 0)}
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    for col, mm in (fs.get("stats") or {}).items():
        if "min" in mm:
            mins[col] = mm["min"]
            maxs[col] = mm["max"]
        if "nulls" in mm:
            nulls[col] = mm["nulls"]
    if mins:
        out["minValues"] = mins
        out["maxValues"] = maxs
    if nulls:
        out["nullCount"] = nulls
    return out


def _commit_actions(root: str, version: int, actions: list[dict]) -> int:
    """Write `actions` as commit `version` (hard-link CAS, the same
    loser-detection as `write_delta`)."""
    tmp = _log_path(root, version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    final = _log_path(root, version)
    try:
        os.link(tmp, final)
    except FileExistsError:
        os.remove(tmp)
        raise RuntimeError(
            f"concurrent Delta commit at version {version}; retry"
        )
    os.remove(tmp)
    return version


# Delta protocol legacy-feature table: upgrading a table at legacy
# minWriterVersion N to the features-based v7 must list every feature
# that N implied, or external writers lose contracts the table already
# promised (delta PROTOCOL.md "Table Features"; reference consumes these
# tables via deltalake DatastoreType, deltacat/types/media.py:353-420).
_LEGACY_WRITER_FEATURES: dict[int, frozenset[str]] = {
    2: frozenset({"appendOnly", "invariants"}),
    3: frozenset({"checkConstraints"}),
    4: frozenset({"changeDataFeed", "generatedColumns"}),
    5: frozenset({"columnMapping"}),
    6: frozenset({"identityColumns"}),
}


def _implied_writer_features(min_writer_version: int) -> set[str]:
    """Every writerFeature implied by a legacy `minWriterVersion` —
    cumulative over the protocol's legacy-feature table."""
    out: set[str] = set()
    for v, names in _LEGACY_WRITER_FEATURES.items():
        if min_writer_version >= v:
            out |= names
    return out


def delete_rows_with_dv(
    spark: SparkSession, root: str, predicate: str
) -> int | None:
    """DELETE ... WHERE via DELETION VECTORS — the merge-on-read delete
    delta-spark performs with DVs enabled: matched row positions are
    found with ONE distributed scan (predicate pushed down, positions
    from Spark's `_metadata.row_index`), serialized as roaring bitmaps
    into a single uuid-named DV file (`sources/deltadv.py`), and each
    touched file is re-added with a `deletionVector` descriptor
    (remove + add, dataChange=true) — no data file is rewritten. Files
    whose every row matched are plain-removed. An existing DV on a
    touched file is MERGED (positions union). First DV commit upgrades
    the protocol to reader v3 / writer v7 with the `deletionVectors`
    feature, exactly what external delta readers key on. Returns the
    committed version, or None when nothing matched."""
    from deltacat_spark.sources import deltadv

    snap = DeltaSnapshot(root)
    # column-mapped tables delete fine: positions are name-agnostic,
    # only the match scan needs logical→physical translation
    snap.ensure_readable(
        allow_deletion_vectors=True, allow_column_mapping=True
    )
    physical = (
        snap.physical_names()
        if snap.column_mapping_mode not in ("", "none")
        else None
    )
    files = snap.live_files()
    df = _scan_files(
        spark, root, snap.schema, snap.partition_columns, files,
        lineage=True, physical=physical,
    )
    # fold each touched file's matched positions with its EXISTING DV
    # and serialize the roaring64 bitmap ON EXECUTORS (applyInPandas
    # keyed by file path) — the driver collects only (path,
    # bitmap_bytes, cardinality): O(touched files), never O(matched
    # rows), so a broad predicate at any scale stays driver-safe.
    hits_df = df.filter(predicate).select("__delta_fp", "__delta_pos")
    dv_desc_rows = [
        (f["path"], json.dumps(f["deletionVector"]))
        for f in files
        if f.get("deletionVector")
    ]
    if dv_desc_rows:
        dmap = local_df(spark,
            dv_desc_rows, "__delta_fp string, __dv_desc string"
        )
        hits_df = hits_df.join(F.broadcast(dmap), "__delta_fp", "left")
    else:
        hits_df = hits_df.withColumn(
            "__dv_desc", F.lit(None).cast("string")
        )
    rt = root

    def _fold_group(pdf):
        import json as _json

        import pandas as _pd

        from deltacat_spark.sources import deltadv as _dv

        fp = pdf["__delta_fp"].iloc[0]
        poss = {int(x) for x in pdf["__delta_pos"]}
        desc = pdf["__dv_desc"].iloc[0]
        if isinstance(desc, str) and desc:
            poss.update(
                _dv.descriptor_positions(rt, _json.loads(desc))
            )
        return _pd.DataFrame(
            {
                "fp": [fp],
                "bm": [_dv.roaring64_serialize(sorted(poss))],
                "card": [len(poss)],
            }
        )

    hits = (
        hits_df.groupBy("__delta_fp")
        .applyInPandas(_fold_group, "fp string, bm binary, card long")
        .collect()
    )
    if not hits:
        return None
    adds_by_path = {f["path"]: f for f in files}

    dv_uuid = uuid.uuid4()
    dv_name = f"deletion_vector_{dv_uuid}.bin"
    enc = deltadv.z85_encode(dv_uuid.bytes)
    now_ms = int(time.time() * 1000)

    blobs: list[bytes] = []
    pending: list[tuple[dict, int]] = []  # (old add, merged cardinality)
    removes_only: list[dict] = []
    for r in sorted(hits, key=lambda r: r["fp"]):
        old = adds_by_path[r["fp"]]
        card = int(r["card"])
        num_records = None
        try:
            num_records = json.loads(old.get("stats") or "{}").get(
                "numRecords"
            )
        except (ValueError, TypeError):
            pass
        if num_records is not None and card >= num_records:
            removes_only.append(old)  # fully-deleted file: drop it
            continue
        blobs.append(deltadv.dv_blob_encode_serialized(bytes(r["bm"])))
        pending.append((old, card))

    actions: list[dict] = []
    feats = set(snap.protocol.get("readerFeatures") or [])
    if pending and "deletionVectors" not in feats:
        prior_writer = int(snap.protocol.get("minWriterVersion") or 2)
        prior_reader = int(snap.protocol.get("minReaderVersion") or 1)
        # legacy reader 2 implies columnMapping — the features-based v3
        # protocol must list it or external readers drop the contract
        implied_reader = (
            {"columnMapping"} if prior_reader >= 2 else set()
        )
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": sorted(
                        feats | {"deletionVectors"} | implied_reader
                    ),
                    # v7 requires every legacy-implied feature listed —
                    # derived from the PRIOR minWriterVersion per the
                    # protocol's legacy-feature table (hardcoding the
                    # v2 pair would silently drop e.g. changeDataFeed
                    # from a v4 table, breaking its CDF contract for
                    # other writers).
                    "writerFeatures": sorted(
                        set(snap.protocol.get("writerFeatures") or [])
                        | {"deletionVectors"}
                        | _implied_writer_features(prior_writer)
                    ),
                }
            }
        )
    if pending:
        spans = deltadv.write_dv_file(os.path.join(root, dv_name), blobs)
        for (old, card), (offset, size) in zip(pending, spans):
            new_add = dict(old)
            new_add["deletionVector"] = {
                "storageType": "u",
                "pathOrInlineDv": enc,
                "offset": offset,
                "sizeInBytes": size,
                "cardinality": card,
            }
            new_add["modificationTime"] = now_ms
            new_add["dataChange"] = True
            actions.append(
                {
                    "remove": {
                        "path": old["path"],
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
            actions.append({"add": new_add})
    for old in removes_only:
        actions.append(
            {
                "remove": {
                    "path": old["path"],
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "DELETE",
                "operationParameters": {"predicate": predicate},
                "engineInfo": "deltacat_spark-native",
            }
        }
    )
    # Commit at snap.version + 1 (NOT latest_version(root) + 1): the
    # remove/re-add actions were computed from `snap`, and a concurrent
    # commit landing during the distributed scan above must make this
    # link() CAS lose — re-reading the latest version here would
    # silently rebase stale actions over it (resurrecting rows the
    # concurrent commit deleted).
    return _commit_actions(root, snap.version + 1, actions)


def update_delta(
    spark: SparkSession,
    root: str,
    predicate: str,
    set_exprs: dict[str, str],
    max_records_per_file: int = 5_000_000,
) -> int | None:
    """UPDATE ... SET ... WHERE with a CHANGE DATA FEED commit — the
    partial-file rewrite shape the whole-file-diff feed could not
    serve: touched files are REWRITTEN (remove + add, carrying their
    unchanged rows), and the commit carries `cdc` actions pointing at
    `_change_data/` parquet holding the row-level
    update_preimage/update_postimage changes (protocol's "Add CDC
    File"), so `read_delta_changes` serves exactly the changed rows.
    First CDF commit stamps `delta.enableChangeDataFeed=true` and
    raises minWriterVersion to 4 (the CDF legacy writer version).
    One distributed scan finds matches; one write rewrites touched
    files; one write stages the cdc rows. Touched files carrying
    DELETION VECTORS fold them into the rewrite (DV-deleted rows stay
    deleted and the new files carry no DV — the CoW resolution of the
    MoR delete, exactly what delta-spark's UPDATE does). Returns the
    committed version, or None when nothing matched."""
    snap = DeltaSnapshot(root)
    snap.ensure_readable(allow_deletion_vectors=True)
    part_cols = snap.partition_columns
    bad = [c for c in set_exprs if c in part_cols]
    if bad:
        raise ValueError(
            f"cannot SET partition columns {bad} (rows would change "
            "partitions; rewrite the table instead)"
        )
    unknown = [c for c in set_exprs if c not in snap.schema.fieldNames()]
    if unknown:
        raise ValueError(f"SET columns {unknown} not in table schema")
    files = snap.live_files()
    all_pos = _dv_positions_frame(spark, root, files)
    df = _scan_files(
        spark, root, snap.schema, part_cols, files, lineage=True
    )
    if all_pos is not None:
        df = df.join(all_pos, ["__delta_fp", "__delta_pos"], "left_anti")
    touched = sorted(
        r["__delta_fp"]
        for r in df.filter(predicate)
        .select("__delta_fp")
        .distinct()
        .collect()
    )
    if not touched:
        return None
    by_path = {f["path"]: f for f in files}

    touched_metas = [by_path[p] for p in touched]
    touched_pos = _dv_positions_frame(spark, root, touched_metas)
    tdf = _scan_files(
        spark, root, snap.schema, part_cols, touched_metas,
        lineage=touched_pos is not None,
    )
    if touched_pos is not None:
        # fold the MoR deletes into the CoW rewrite: DV-deleted rows
        # stay deleted, the new files carry no DV
        tdf = tdf.join(
            touched_pos, ["__delta_fp", "__delta_pos"], "left_anti"
        ).drop("__delta_fp", "__delta_pos")
    cond = F.expr(predicate)
    # SQL UPDATE semantics: the predicate and EVERY SET right-hand side
    # are evaluated against the PRE-image simultaneously — one select,
    # never chained withColumn (which would feed already-updated columns
    # into later SET expressions and re-evaluate the predicate on them).
    updated = tdf.select(
        *[
            (
                F.when(cond, F.expr(set_exprs[c])).otherwise(F.col(c))
                if c in set_exprs
                else F.col(c)
            ).alias(c)
            for c in tdf.columns
        ]
    )
    new_adds = _stage_files(
        updated, root, part_cols, max_records_per_file
    )

    pre = tdf.filter(predicate).withColumn(
        "_change_type", F.lit("update_preimage")
    )
    base = pre.drop("_change_type")
    # postimage shares the same simultaneous pre-image evaluation as the
    # table rewrite (all rows here match the predicate, so no when())
    post = base.select(
        *[
            (F.expr(set_exprs[c]) if c in set_exprs else F.col(c)).alias(c)
            for c in base.columns
        ]
    ).withColumn("_change_type", F.lit("update_postimage"))
    cdc_adds = _stage_files(
        pre.unionByName(post),
        root,
        part_cols,
        max_records_per_file,
        prefix="_change_data",
    )

    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    cfg = dict(snap.metadata.get("configuration") or {})
    if cfg.get("delta.enableChangeDataFeed") != "true":
        cfg["delta.enableChangeDataFeed"] = "true"
        md = dict(snap.metadata)
        md["configuration"] = cfg
        actions.append({"metaData": md})
        prior_writer = int(snap.protocol.get("minWriterVersion") or 2)
        if prior_writer < 4:
            proto = dict(snap.protocol or {"minReaderVersion": 1})
            proto["minWriterVersion"] = 4
            actions.append({"protocol": proto})
        elif prior_writer >= 7 and "changeDataFeed" not in set(
            snap.protocol.get("writerFeatures") or []
        ):
            proto = dict(snap.protocol)
            proto["writerFeatures"] = sorted(
                set(proto.get("writerFeatures") or []) | {"changeDataFeed"}
            )
            actions.append({"protocol": proto})
    for p in touched:
        actions.append(
            {
                "remove": {
                    "path": p,
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
    for a in new_adds:
        actions.append({"add": a})
    for a in cdc_adds:
        actions.append(
            {
                "cdc": {
                    "path": a["path"],
                    "partitionValues": a["partitionValues"],
                    "size": a["size"],
                    "dataChange": False,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "UPDATE",
                "operationParameters": {"predicate": predicate},
                "engineInfo": "deltacat_spark-native",
            }
        }
    )
    # snap.version + 1 (not latest + 1): the CAS must detect commits
    # that landed during the distributed scan — see delete_rows_with_dv
    return _commit_actions(root, snap.version + 1, actions)


def latest_txn_version(root: str, app_id: str) -> int | None:
    """The highest SetTransaction version committed for `app_id`, or
    None when the table (or the app) has never committed one."""
    if not _list_versions(root):
        return None
    return DeltaSnapshot(root).txns.get(app_id)


def write_checkpoint(
    root: str, version: int, layout: str = "classic"
) -> None:
    """Columnar checkpoint per the spec: one parquet row per live
    action (protocol, metaData, every live add, and the latest txn per
    appId — dropping those would reset every idempotent writer), plus
    _last_checkpoint.

    `layout="v2"` (r14) writes the delta-spark 3.x V2 shape instead:
    add actions land in a SIDECAR parquet under `_delta_log/_sidecars/`
    and the UUID-named top-level `N.checkpoint.{uuid}.parquet` carries
    the non-file actions plus `checkpointMetadata` and the `sidecar`
    pointer. Interop-out note: external readers require the table
    protocol to declare the `v2Checkpoint` table feature
    (minReaderVersion 3 / minWriterVersion 7) — stamp it with a
    protocol commit before handing the table to delta-spark; this
    repo's own reader accepts either way."""
    if layout not in ("classic", "v2"):
        raise ValueError(f"layout must be classic|v2, got {layout!r}")
    import pyarrow as pa
    import pyarrow.parquet as pq

    snap = DeltaSnapshot(root, version)
    rows: list[dict] = [
        {"protocol": snap.protocol or {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": snap.metadata},
    ]
    for a in snap.live_files():
        rows.append({"add": a})
    for app_id in sorted(snap.txns):
        rows.append(
            {"txn": {"appId": app_id, "version": snap.txns[app_id]}}
        )
    cols = ("protocol", "metaData", "add", "txn")
    norm = [{c: r.get(c) for c in cols} for r in rows]
    # explicit schema: dict-shaped fields are map<string,string> (pylist
    # inference would make `configuration: {}` an empty struct, which
    # parquet cannot encode)
    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        (
                            "format",
                            pa.struct(
                                [
                                    ("provider", pa.string()),
                                    ("options", str_map),
                                ]
                            ),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", str_map),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", str_map),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        # dropping a DV descriptor at checkpoint time
                        # would resurrect its deleted rows
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
            pa.field(
                "txn",
                pa.struct(
                    [
                        ("appId", pa.string()),
                        ("version", pa.int64()),
                    ]
                ),
            ),
        ]
    )

    def _mapify(d: dict | None) -> list | None:
        return None if d is None else list(d.items())

    for r in norm:
        if r.get("metaData"):
            m = dict(r["metaData"])
            m["configuration"] = _mapify(m.get("configuration") or {})
            fmt = dict(m.get("format") or {"provider": "parquet"})
            fmt["options"] = _mapify(fmt.get("options") or {})
            m["format"] = fmt
            m = {k: m.get(k) for k in (
                "id", "format", "schemaString", "partitionColumns",
                "configuration", "createdTime")}
            r["metaData"] = m
        if r.get("add"):
            a = dict(r["add"])
            a["partitionValues"] = _mapify(a.get("partitionValues") or {})
            a = {k: a.get(k) for k in (
                "path", "partitionValues", "size", "modificationTime",
                "dataChange", "stats", "deletionVector")}
            r["add"] = a
    if layout == "classic":
        table = pa.Table.from_pylist(norm, schema=schema)
        pq.write_table(table, _ckpt_path(root, version))
        with open(
            os.path.join(root, LOG_DIR, "_last_checkpoint"), "w"
        ) as f:
            json.dump({"version": version, "size": len(rows)}, f)
        return

    # ---- v2 layout: sidecar(s) hold the adds, the UUID-named
    # top-level holds everything else + checkpointMetadata + sidecar
    ckpt_uuid = str(uuid.uuid4())
    sc_dir = os.path.join(root, LOG_DIR, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    add_rows = [r for r in norm if r.get("add") is not None]
    other_rows = [r for r in norm if r.get("add") is None]
    sc_name = f"{ckpt_uuid}.parquet"
    sc_path = os.path.join(sc_dir, sc_name)
    pq.write_table(
        pa.Table.from_pylist(
            [{"add": r["add"]} for r in add_rows],
            schema=pa.schema([schema.field("add")]),
        ),
        sc_path,
    )
    top_schema = pa.schema(
        list(schema)
        + [
            pa.field(
                "sidecar",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("sizeInBytes", pa.int64()),
                        ("modificationTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "checkpointMetadata",
                pa.struct([("version", pa.int64())]),
            ),
        ]
    )
    top_rows = [dict(r) for r in other_rows]
    top_rows.append(
        {
            "sidecar": {
                "path": sc_name,
                "sizeInBytes": os.path.getsize(sc_path),
                "modificationTime": int(time.time() * 1000),
            }
        }
    )
    top_rows.append({"checkpointMetadata": {"version": version}})
    top = os.path.join(
        root, LOG_DIR, f"{version:020d}.checkpoint.{ckpt_uuid}.parquet"
    )
    pq.write_table(pa.Table.from_pylist(top_rows, schema=top_schema), top)
    with open(os.path.join(root, LOG_DIR, "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": len(rows)}, f)


# ---------------------------------------------------------------------------
# catalog bridge
# ---------------------------------------------------------------------------


def optimize_delta(
    spark: SparkSession, root: str, min_files: int = 2
) -> int | None:
    """Bin-pack compaction — Delta's OPTIMIZE: each partition's live
    files collapse into one, committed as adds + removes with
    `dataChange=false` (a reorganization: streams/CDC readers must not
    re-deliver the rows, and time travel to earlier versions still
    resolves the old files, which stay on disk). ONE fanout Spark job
    compacts every eligible partition. Returns the committed version,
    or None when no partition had `min_files`+ files."""
    snap = DeltaSnapshot(root)
    # a DV'd file cannot be blindly repacked — its deleted rows would
    # resurrect in the compacted output; fail loudly (rewrite first).
    # Column-mapped tables compact fine: files keep their PHYSICAL
    # column names end to end, so the repack is name-agnostic.
    snap.ensure_readable(allow_column_mapping=True)
    live = snap.live_files()
    groups: dict[str, list[dict]] = {}
    for f in live:
        key = json.dumps(f.get("partitionValues") or {}, sort_keys=True)
        groups.setdefault(key, []).append(f)
    todo = {k: fs for k, fs in groups.items() if len(fs) >= min_files}
    if not todo:
        return None

    pairs = [
        (os.path.join(root, f["path"]), k)
        for k, fs in todo.items()
        for f in fs
    ]
    # mapped tables: the files carry PHYSICAL column names — scan and
    # rewrite under those names (no rename round-trip needed)
    phys = (
        snap.physical_names()
        if snap.column_mapping_mode not in ("", "none")
        else {}
    )
    parts = set(snap.partition_columns)
    scan_schema = T.StructType(
        [
            T.StructField(phys.get(f.name, f.name), f.dataType, f.nullable)
            for f in snap.schema.fields
            if f.name not in parts
        ]
    )
    src = spark.read.schema(scan_schema).parquet(
        *[p for p, _ in pairs]
    ).withColumn(
        "__src",
        F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/"),
    )
    pmap = local_df(spark, pairs, "__src string, __pk string")
    staging = os.path.join(root, f".staging-{uuid.uuid4().hex[:12]}")
    (
        src.join(F.broadcast(pmap), "__src")
        .drop("__src")
        # explicit count: see the iceberg/hudi fanout note (AQE
        # would coalesce the small shuffle to one serial write task)
        .repartition(
            spark.sparkContext.defaultParallelism, "__pk"
        )
        .write.mode("overwrite")
        .partitionBy("__pk")
        .parquet(staging)
    )

    from urllib.parse import unquote

    now_ms = int(time.time() * 1000)
    adds = []
    for d in sorted(os.listdir(staging)):
        if not d.startswith("__pk="):
            continue
        key = unquote(d.split("=", 1)[1])
        rel_dir = os.path.dirname(todo[key][0]["path"])
        fname = f"part-opt-{uuid.uuid4().hex[:12]}.parquet"
        rel = os.path.join(rel_dir, fname) if rel_dir else fname
        dst = os.path.join(root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        files = [
            f
            for f in sorted(os.listdir(os.path.join(staging, d)))
            if f.endswith(".parquet")
        ]
        if len(files) == 1:
            os.replace(os.path.join(staging, d, files[0]), dst)
        else:  # hash-collided task splits: merge driver-side (bounded
            # by one partition's rows)
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.concat_tables(
                    pq.read_table(os.path.join(staging, d, f))
                    for f in files
                ),
                dst,
            )
        stats = _delta_stats(dst)
        if stats.get("numRecords") == 0:
            os.remove(dst)
            continue
        adds.append(
            {
                "add": {
                    "path": rel.replace(os.sep, "/"),
                    "partitionValues": json.loads(key),
                    "size": os.path.getsize(dst),
                    "modificationTime": now_ms,
                    "dataChange": False,
                    "stats": json.dumps(stats),
                }
            }
        )
    shutil.rmtree(staging, ignore_errors=True)

    actions: list[dict] = list(adds)
    for fs in todo.values():
        for f in fs:
            actions.append(
                {
                    "remove": {
                        "path": f["path"],
                        "deletionTimestamp": now_ms,
                        "dataChange": False,
                    }
                }
            )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "OPTIMIZE",
                "operationParameters": {"minFiles": min_files},
                "engineInfo": "deltacat_spark-native",
            }
        }
    )
    # snap.version + 1: the CAS must detect commits that landed during
    # the repack scan (re-adding files a concurrent commit removed
    # would resurrect data) — same rule as delete_rows_with_dv
    return _commit_actions(root, snap.version + 1, actions)


def vacuum_delta(root: str, keep_versions: int = 1) -> list[str]:
    """Remove data files no longer referenced by the retained log
    window (the live sets at the last `keep_versions` versions).
    Returns deleted relative paths."""
    versions = _list_versions(root)
    if not versions:
        return []
    keep: set[str] = set()
    for v in versions[-max(keep_versions, 1):]:
        keep.update(f["path"] for f in DeltaSnapshot(root, v).live_files())
    all_paths: set[str] = set()
    for v in versions:
        with open(_log_path(root, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "add" in a:
                    all_paths.add(a["add"]["path"])
    doomed = sorted(all_paths - keep)
    for rel in doomed:
        p = os.path.join(root, rel)
        if os.path.isfile(p):
            os.remove(p)
    return doomed


def export_table_to_delta(
    catalog, table: str, dest: str, namespace: str = "default"
) -> int:
    """Materialize a catalog table's current snapshot as a Delta table
    (CoW semantics: the export is the resolved current state)."""
    df = catalog.read_table(table, namespace=namespace)
    info = catalog.get_table(table, namespace=namespace) or {}
    # only identity transforms translate to Delta partition columns;
    # bucket/truncate/y-m-d partitions export unpartitioned (still a
    # correct table — Delta has no transform metadata to carry them)
    scheme = [
        pk.get("source") or pk.get("name")
        for pk in (info.get("partition_scheme") or [])
        if (pk.get("transform") or "identity") == "identity"
    ]
    return write_delta(
        df, dest, mode="overwrite", partition_by=[c for c in scheme if c]
    )


def import_delta_to_table(
    catalog,
    spark: SparkSession,
    src: str,
    table: str,
    namespace: str = "default",
    version: int | None = None,
    **write_kwargs: Any,
) -> None:
    """External Delta table → catalog table (snapshot copy-in)."""
    df = read_delta(spark, src, version=version)
    catalog.write_to_table(
        df, table, namespace=namespace, mode="auto", **write_kwargs
    )
