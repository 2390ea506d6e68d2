"""Fail-loudly guards for external lakehouse tables carrying features
this jar-free implementation would otherwise SILENTLY misread — the
same defect class as the r10-ADVICE Iceberg equality-delete misread:

* Delta deletion vectors (deleted rows would reappear), column
  mapping (physical names differ), unknown v3 readerFeatures;
* Iceberg format-version != 2 (v1 manifests lack sequence numbers,
  v3 adds deletion vectors);
* Hudi 1.x table layouts (table version > 6 renames timeline files).

Each guard must raise NotImplementedError at read time, batch and
(for Delta DVs) streaming.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources.deltalake import (
    DeltaSnapshot,
    read_delta,
    read_delta_changes,
    write_delta,
)
from deltacat_spark.sources.hudi import read_hudi, write_hudi
from deltacat_spark.sources.iceberg import read_iceberg, write_iceberg


def _append_action(root, action):
    from deltacat_spark.sources.deltalake import _list_versions

    v = _list_versions(root)[-1] + 1
    with open(
        os.path.join(root, "_delta_log", f"{v:020d}.json"), "w"
    ) as f:
        f.write(json.dumps(action) + "\n")


def _delta_table(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta(spark.range(10).select("id"), root)
    return root


def test_delta_deletion_vector_add_refused(spark, tmp_path):
    root = _delta_table(spark, tmp_path)
    _append_action(
        root,
        {
            "add": {
                "path": "part-x.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "deletionVector": {
                    "storageType": "u",
                    "pathOrInlineDv": "x",
                    "offset": 1,
                    "sizeInBytes": 1,
                    "cardinality": 1,
                },
            }
        },
    )
    with pytest.raises(NotImplementedError, match="deletion vector"):
        read_delta(spark, root)
    with pytest.raises(NotImplementedError, match="deletion vector"):
        read_delta_changes(spark, root, from_version=0)
    # streaming planner refuses too
    from deltacat_spark.streaming.lakehouse_source import (
        DeltaAppendsStreamReader,
    )

    reader = DeltaAppendsStreamReader({"root": root})
    with pytest.raises(NotImplementedError, match="deletion vector"):
        reader.partitions(
            reader.initialOffset(), reader.latestOffset()
        )


def test_delta_column_mapping_refused(spark, tmp_path):
    root = _delta_table(spark, tmp_path)
    snap = DeltaSnapshot(root)
    md = dict(snap.metadata)
    md["configuration"] = {"delta.columnMapping.mode": "name"}
    _append_action(root, {"metaData": md})
    with pytest.raises(NotImplementedError, match="column mapping"):
        read_delta(spark, root)


def test_delta_unknown_reader_feature_refused(spark, tmp_path):
    root = _delta_table(spark, tmp_path)
    _append_action(
        root,
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors", "timestampNtz"],
                "writerFeatures": ["deletionVectors"],
            }
        },
    )
    with pytest.raises(
        NotImplementedError, match="deletionVectors"
    ):
        read_delta(spark, root)


def test_delta_tolerated_reader_feature_ok(spark, tmp_path):
    root = _delta_table(spark, tmp_path)
    _append_action(
        root,
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
            }
        },
    )
    assert read_delta(spark, root).count() == 10


def test_iceberg_format_version_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(spark.range(5).select("id"), root)
    mdir = os.path.join(root, "metadata")
    v = int(open(os.path.join(mdir, "version-hint.text")).read())
    mpath = os.path.join(mdir, f"v{v}.metadata.json")
    meta = json.load(open(mpath))
    meta["format-version"] = 3
    json.dump(meta, open(mpath, "w"))
    with pytest.raises(NotImplementedError, match="format-version 3"):
        read_iceberg(spark, root).count()


def test_hudi_table_version_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    write_hudi(
        spark.range(5).select("id"), root, record_key_field="id",
        operation="insert",
    )
    props = os.path.join(root, ".hoodie", "hoodie.properties")
    body = open(props).read().replace(
        "hoodie.table.version=6", "hoodie.table.version=8"
    )
    open(props, "w").write(body)
    with pytest.raises(NotImplementedError, match="table version 8"):
        read_hudi(spark, root)
