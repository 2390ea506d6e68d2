"""Log-replay snapshots: live file set, schema, stats-based file skipping.

Replaces the reference's driver-side delta discovery
(`catalog/main/impl.py:1356-1386,2716-2834`): replaying the commit log
yields the table's live files (with per-file partition values and
column min/max stats), the current schema/properties, and the delta
sub-streams a merge-on-read reader needs. File skipping is a driver-side
filter of the file list against stats — Delta-style data skipping, done
*before* Spark ever sees a path (so a 100 TB table with a selective
predicate schedules only the matching files).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from deltacat_spark.schema import Schema
from deltacat_spark.storage.commit import Commit, CommitLog


@dataclass
class FileEntry:
    path: str  # relative to the table root

    def abs_path(self, table_root: str) -> str:
        import os

        return os.path.join(table_root, self.path)
    records: int | None = None
    bytes: int | None = None
    partition_values: dict[str, Any] | None = None
    stats: dict[str, dict[str, Any]] | None = None  # col -> {min,max,nulls}
    content_type: str | None = None  # None ⇒ parquet data file
    # Provenance for merge-on-read ordering (reference orders envelopes
    # by (stream_position, file_index) — `steps/merge.py:522-543`).
    version: int = 0
    stream_position: int | None = None
    file_index: int = 0
    delta_type: str | None = None


@dataclass
class Snapshot:
    version: int
    schema: Schema | None
    table_root: str = ""
    properties: dict[str, Any] = dc_field(default_factory=dict)
    partition_scheme: list[dict] | None = None
    sort_scheme: list[dict] | None = None
    watermark: int | None = None
    files: list[FileEntry] = dc_field(default_factory=list)
    commits: list[Commit] = dc_field(default_factory=list)

    @classmethod
    def of(
        cls,
        log: CommitLog,
        version_as_of: int | None = None,
        timestamp_as_of: int | None = None,
    ) -> "Snapshot":
        commits = log.replay(version_as_of, timestamp_as_of)
        if not commits:
            raise FileNotFoundError(f"no commits in {log.log_dir}")
        snap = cls(
            version=commits[-1].version,
            schema=None,
            table_root=log.table_root,
            commits=commits,
        )
        live: dict[str, FileEntry] = {}
        for c in commits:
            if c.schema_json:
                snap.schema = Schema.from_json(c.schema_json)
            if c.partition_scheme is not None:
                snap.partition_scheme = c.partition_scheme
            if c.sort_scheme is not None:
                snap.sort_scheme = c.sort_scheme
            if c.properties:
                snap.properties.update(c.properties)
            if c.watermark is not None:
                snap.watermark = max(snap.watermark or 0, c.watermark)
            for p in c.removes:
                live.pop(p, None)
            for idx, add in enumerate(c.adds):
                live[add["path"]] = FileEntry(
                    path=add["path"],
                    records=add.get("records"),
                    bytes=add.get("bytes"),
                    partition_values=add.get("partition_values"),
                    stats=add.get("stats"),
                    content_type=add.get("content_type"),
                    version=c.version,
                    stream_position=c.stream_position,
                    file_index=idx,
                    delta_type=c.delta_type,
                )
        snap.files = sorted(
            live.values(), key=lambda f: (f.version, f.file_index)
        )
        return snap

    # -- file pruning --------------------------------------------------
    def prune(
        self,
        partition_filter: dict[str, Any] | None = None,
        predicates: list[tuple[str, str, Any]] | None = None,
    ) -> list[FileEntry]:
        """Driver-side file skipping.

        ``partition_filter``: {partition_col: value | [values]} exact
        match on recorded partition values (reference `partition_filter`
        read param, `catalog/main/impl.py:1356-1386`).
        ``predicates``: [(col, op, value)] with op in <,<=,>,>=,=
        checked against per-file min/max stats (reference delta stats /
        rivulet SST min-max pruning, SURVEY §4).
        """
        out = []
        for f in self.files:
            if partition_filter and f.partition_values is not None:
                ok = True
                for k, v in partition_filter.items():
                    pv = f.partition_values.get(k)
                    allowed = v if isinstance(v, (list, tuple, set)) else [v]
                    if pv not in [str(a) for a in allowed]:
                        ok = False
                        break
                if not ok:
                    continue
            if predicates and f.stats:
                ok = True
                for col, op, v in predicates:
                    st = f.stats.get(col)
                    if not st:
                        continue
                    lo, hi = st.get("min"), st.get("max")
                    if lo is None or hi is None:
                        continue
                    # Keep the file iff some row in [lo, hi] can match.
                    if op == "<":
                        ok = lo < v
                    elif op == "<=":
                        ok = lo <= v
                    elif op == ">":
                        ok = hi > v
                    elif op == ">=":
                        ok = hi >= v
                    elif op == "=":
                        ok = lo <= v <= hi
                    if not ok:
                        break
                if not ok:
                    continue
            out.append(f)
        return out
