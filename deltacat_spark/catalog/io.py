"""Physical data-file IO for the table format.

Write path: executors write parquet (optionally hash/partition-layout
via `partitionBy` on generated transform columns, sorted within files by
the sort scheme, sliced by `maxRecordsPerFile` — the reference's
`records_per_compacted_file` slicing, `storage/main/impl.py:2578-2659`);
the driver then reads back parquet footers for per-file records/bytes +
column min/max stats recorded in the commit log (the reference's delta
stats, `compute/stats/models/delta_stats.py`, reborn as Delta-style
skipping stats).

Each commit writes under its own `data/{uuid}/` directory so concurrent
writers never collide on filenames and failed writes are garbage, not
corruption (cleaned by vacuum).
"""

from __future__ import annotations

import os
import uuid
from typing import Any
from urllib.parse import unquote

import pyarrow.parquet as pq
from pyspark.sql import DataFrame

from deltacat_spark.storage.fs import LOCAL_FS
from deltacat_spark.plans.transforms import (
    PART_PREFIX,
    PartitionKey,
    SortKey,
    partition_columns,
    sort_columns,
)

# Reference default: 4M records per compacted file
# (`compute/compactor_v2/constants.py:7`).
DEFAULT_MAX_RECORDS_PER_FILE = 4_000_000

_STATS_MAX_COLS = 32
_STATS_TYPES = {
    "BOOLEAN",
    "INT32",
    "INT64",
    "FLOAT",
    "DOUBLE",
    "BYTE_ARRAY",
}


def write_data_files(
    df: DataFrame,
    table_root: str,
    partition_scheme: list[PartitionKey] | None = None,
    sort_scheme: list[SortKey] | None = None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    partition_salt: int | None = None,
    fs=LOCAL_FS,
    bloom_columns: list[str] | None = None,
) -> list[dict[str, Any]]:
    """Write a batch; return commit `add` action dicts.

    `partition_salt=N`: shuffle on (partition values, salt) across N
    explicit tasks instead of partition values alone — a low-cardinality
    partition scheme (e.g. 3 regions on a 1000-executor cluster) then
    uses N writers rather than one task per partition value. Salt is a
    deterministic hash of the row, never written to the files.

    `fs` (`storage/fs.py` seam): Spark writes to ``fs.spark_path(dest)``
    (the URI its Hadoop layer resolves) and the driver-side footer-stats
    pass reads back through the seam — so tables on object stores use
    one consistent path mapping for data and control plane.
    """
    dest = fs.join(table_root, "data", uuid.uuid4().hex)
    # A delta payload need not carry every table column: a DELETE delta
    # is a key filter, a partial-upsert delta a column subset. Partition
    # and sort keys whose source column is absent are skipped — the
    # delta file lands unpartitioned and the read path's pruning stays
    # conservative for files without recorded partition values.
    names = set(df.columns)
    if partition_scheme:
        partition_scheme = [pk for pk in partition_scheme if pk.source in names]
    if sort_scheme:
        sort_scheme = [sk for sk in sort_scheme if sk.column in names]
    part_cols = partition_columns(partition_scheme, df.schema)
    out = df
    for name, col in part_cols.items():
        out = out.withColumn(name, col)
    if part_cols:
        if partition_salt and partition_salt > 1:
            from pyspark.sql import functions as F

            salt = F.pmod(
                F.hash(*[F.col(c) for c in df.columns]), F.lit(partition_salt)
            )
            out = out.withColumn("__dcs_salt", salt)
            out = out.repartition(
                partition_salt, *part_cols.keys(), "__dcs_salt"
            ).drop("__dcs_salt")
        else:
            # Cluster rows of one partition into the same task so each
            # partition gets few, large files. Explicit count: a bare
            # repartition(cols) gets AQE-coalesced to one task on
            # small writes and serializes the partitionBy fanout;
            # each key still hashes to exactly one task, so per-dir
            # file counts are unchanged at any scale.
            out = out.repartition(
                out.sparkSession.sparkContext.defaultParallelism,
                *part_cols.keys(),
            )
    if sort_scheme:
        out = out.sortWithinPartitions(*sort_columns(sort_scheme))
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if part_cols:
        writer = writer.partitionBy(*part_cols.keys())
    writer.parquet(fs.spark_path(dest))
    adds = collect_add_actions(dest, table_root, fs=fs)
    if bloom_columns:
        from deltacat_spark.storage.bloom import attach_blooms, eligible_columns

        cols = eligible_columns(df, [c for c in bloom_columns if c in names])
        if cols:
            try:
                attach_blooms(adds, table_root, cols, df.sparkSession, fs)
            except Exception as e:  # pragma: no cover - exercised via test
                # Blooms are a read optimization, never a durability
                # dependency: a failed bloom pass must not fail the
                # commit. Files without bloom_ref simply don't skip.
                import warnings

                warnings.warn(
                    f"bloom filter pass failed, committing without "
                    f"blooms: {type(e).__name__}: {e}"
                )
    return adds


def collect_add_actions(
    dest: str, table_root: str, fs=LOCAL_FS
) -> list[dict[str, Any]]:
    """Paths are recorded *relative to the table root* so the table stays
    relocatable (rename_table is an O(1) directory move).

    File BASENAMES are made unique within the commit: Spark's
    partitionBy writer reuses one task filename (part-00000-<task uuid>)
    across every partition directory that task writes, but basenames are
    the table-wide row-identity anchor (MoR provenance map + positional
    deletes key on them because `input_file_name()` URI-prefixes full
    paths). Only colliding files are renamed, so the unpartitioned fast
    path stays rename-free (matters on object stores where a move is a
    server-side copy)."""
    paths = [
        p for p in sorted(fs.walk_files(dest)) if p.endswith(".parquet")
    ]
    from collections import Counter

    counts = Counter(p.rsplit("/", 1)[-1] for p in paths)
    deduped = []
    for i, path in enumerate(paths):
        fname = path.rsplit("/", 1)[-1]
        if counts[fname] > 1:
            new = path[: -len(fname)] + f"d{i:05d}-{fname}"
            fs.rename(path, new)
            path = new
        deduped.append(path)
    adds = []
    for path in deduped:
        fname = path.rsplit("/", 1)[-1]
        rel = fs.relpath(path, dest)
        rel_dir = rel[: -(len(fname) + 1)] if "/" in rel else ""
        pvals = _partition_values_from_relpath(rel_dir)
        adds.append(
            {
                "add": {
                    "path": fs.relpath(path, table_root),
                    "partition_values": pvals or None,
                    **_footer_stats(path, fs=fs),
                }
            }
        )
    adds = [a for a in adds if a["add"].get("records", 0) > 0]
    return adds


def _partition_values_from_relpath(rel: str) -> dict[str, str]:
    out: dict[str, str] = {}
    if rel in (".", ""):
        return out
    for seg in rel.split("/"):
        if "=" in seg:
            k, v = seg.split("=", 1)
            if k.startswith(PART_PREFIX):
                k = k[len(PART_PREFIX):]
            out[k] = unquote(v)
    return out


def _footer_stats(path: str, fs=LOCAL_FS) -> dict[str, Any]:
    with fs.open_binary(path) as fh:
        md = pq.read_metadata(fh)
    stats: dict[str, dict[str, Any]] = {}
    # per-column null counts, summed over row groups — recorded only
    # when EVERY row group reports one (a partial sum would understate
    # and could wrongly prove "no nulls"). Tracked for all stats-typed
    # top-level columns, including all-null ones that carry no min/max.
    nulls: dict[str, int] = {}
    nulls_bad: set = set()
    ncols = min(md.num_columns, _STATS_MAX_COLS)
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(ncols):
            col = g.column(i)
            st = col.statistics
            name = col.path_in_schema
            if "." in name:  # nested — skip
                continue
            if st is not None and st.has_null_count and name not in nulls_bad:
                nulls[name] = nulls.get(name, 0) + int(st.null_count)
            else:
                nulls_bad.add(name)
                nulls.pop(name, None)
            if st is None or not st.has_min_max:
                continue
            if col.physical_type not in _STATS_TYPES:
                continue
            try:
                mn, mx = st.min, st.max
            except Exception:
                # pyarrow can't cast stats for every logical type (e.g.
                # decimals on some physical encodings) — no stats, no
                # pruning for that column; never a failed commit.
                continue
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    continue
            cur = stats.get(name)
            if cur is None:
                stats[name] = {"min": mn, "max": mx}
            else:
                cur["min"] = min(cur["min"], mn)
                cur["max"] = max(cur["max"], mx)
    for name, n in nulls.items():
        stats.setdefault(name, {})["nulls"] = n
    out: dict[str, Any] = {
        "records": md.num_rows,
        "bytes": fs.size(path),
    }
    if stats:
        out["stats"] = _jsonable(stats)
    return out


def _jsonable(stats: dict) -> dict:
    import datetime

    def conv(v):
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return v

    return {
        c: {k: conv(v) for k, v in mm.items()} for c, mm in stats.items()
    }
