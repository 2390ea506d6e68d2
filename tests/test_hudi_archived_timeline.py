"""Hudi TIMELINE ARCHIVAL reads (r14, VERDICT r13 gap #3 tail): real
Hudi moves old instants out of `.hoodie/` into HoodieLogFormat archive
logs under `.hoodie/archived/` — before this, an archived table
SILENTLY dropped the file groups those instants registered (row loss,
not a refusal). The timeline replay now folds COMPLETED archived
entries back in: `completed_instants`, `instant_kind`, and
`_commit_meta` all resolve through the archive, so snapshot reads,
slices, and incremental pulls stay complete."""

import json
import os

from pyspark.sql import functions as F

from deltacat_spark.sources import hudi_log
from deltacat_spark.sources.hudi import (
    HOODIE_DIR,
    _commit_meta,
    completed_instants,
    file_slices,
    instant_kind,
    read_hudi,
    write_hudi,
)

META_ENTRY_SCHEMA = {
    "type": "record",
    "name": "HoodieArchivedMetaEntry",
    "fields": [
        {"name": "commitTime", "type": ["null", "string"]},
        {"name": "actionState", "type": ["null", "string"]},
        {"name": "actionType", "type": ["null", "string"]},
        {
            "name": "hoodieCommitMetadata",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "HoodieCommitMetadata",
                    "fields": [
                        {
                            "name": "partitionToWriteStats",
                            "type": [
                                "null",
                                {
                                    "type": "map",
                                    "values": {
                                        "type": "array",
                                        "items": {
                                            "type": "record",
                                            "name": "HoodieWriteStat",
                                            "fields": [
                                                {
                                                    "name": "fileId",
                                                    "type": ["null", "string"],
                                                },
                                                {
                                                    "name": "path",
                                                    "type": ["null", "string"],
                                                },
                                                {
                                                    "name": "numWrites",
                                                    "type": ["null", "long"],
                                                },
                                                {
                                                    "name": "fileSizeInBytes",
                                                    "type": ["null", "long"],
                                                },
                                                {
                                                    "name": "prevCommit",
                                                    "type": ["null", "string"],
                                                },
                                            ],
                                        },
                                    },
                                },
                            ],
                        },
                        {"name": "compacted", "type": ["null", "boolean"]},
                        {"name": "operationType", "type": ["null", "string"]},
                    ],
                },
            ],
        },
    ],
}


def _archive_instant(root, instant, state="COMPLETED"):
    """Move one active instant into an external-shaped archive log."""
    kind = instant_kind(root, instant)
    active = os.path.join(root, HOODIE_DIR, f"{instant}.{kind}")
    meta = json.load(open(active))
    rec = {
        "commitTime": instant,
        "actionState": state,
        "actionType": kind,
        "hoodieCommitMetadata": {
            "partitionToWriteStats": {
                part: [
                    {
                        "fileId": st.get("fileId"),
                        "path": st.get("path"),
                        "numWrites": st.get("numWrites"),
                        "fileSizeInBytes": st.get("fileSizeInBytes"),
                        "prevCommit": st.get("prevCommit"),
                    }
                    for st in stats
                ]
                for part, stats in meta.get(
                    "partitionToWriteStats", {}
                ).items()
            },
            "compacted": meta.get("compacted", False),
            "operationType": meta.get("operationType"),
        },
    }
    arch_dir = os.path.join(root, HOODIE_DIR, "archived")
    os.makedirs(arch_dir, exist_ok=True)
    hudi_log.append_avro_data_block(
        os.path.join(arch_dir, ".commits_.archive.1_1-0-1"),
        [rec],
        META_ENTRY_SCHEMA,
        instant,
    )
    os.remove(active)


def _table(spark, tmp_path):
    root = str(tmp_path / "t")
    for lo in (0, 10, 20):
        write_hudi(
            spark.range(lo, lo + 10).select(
                "id", F.lit("a").alias("cat")
            ),
            root,
            record_key_field="id",
            operation="insert" if lo == 0 else "upsert",
        )
    return root


def test_archived_instant_still_serves_rows(spark, tmp_path):
    root = _table(spark, tmp_path)
    before = sorted(r.id for r in read_hudi(spark, root).collect())
    assert before == list(range(30))
    first = completed_instants(root)[0]
    _archive_instant(root, first)
    # timeline still complete: listing, kind, metadata, slices
    assert completed_instants(root)[0] == first
    assert instant_kind(root, first) == "commit"
    assert _commit_meta(root, first).get("partitionToWriteStats")
    assert len(file_slices(root)) == 3
    got = sorted(r.id for r in read_hudi(spark, root).collect())
    assert got == list(range(30)), "archived instant's rows were lost"


def test_archive_multiple_and_cache(spark, tmp_path):
    root = _table(spark, tmp_path)
    insts = completed_instants(root)
    _archive_instant(root, insts[0])
    _archive_instant(root, insts[1])
    assert completed_instants(root) == insts
    got = sorted(r.id for r in read_hudi(spark, root).collect())
    assert got == list(range(30))
    # repeated listings hit the (path, size) cache — same answer
    assert completed_instants(root) == insts


def test_inflight_archived_entries_ignored(spark, tmp_path):
    root = _table(spark, tmp_path)
    insts = completed_instants(root)
    # plant an INFLIGHT archive record for a bogus instant
    arch_dir = os.path.join(root, HOODIE_DIR, "archived")
    os.makedirs(arch_dir, exist_ok=True)
    hudi_log.append_avro_data_block(
        os.path.join(arch_dir, ".commits_.archive.2_1-0-1"),
        [
            {
                "commitTime": "99999999999999999",
                "actionState": "INFLIGHT",
                "actionType": "commit",
                "hoodieCommitMetadata": None,
            }
        ],
        META_ENTRY_SCHEMA,
        "99999999999999999",
    )
    assert completed_instants(root) == insts
