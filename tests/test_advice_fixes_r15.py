"""Round-15 ADVICE fixes pinned by behavior.

1. Branch refs: `refs.main` advances with every write once the table
   carries refs, so `read_iceberg(ref="main")` never serves stale data
   and current-snapshot-id == refs.main.snapshot-id (what external
   loaders validate).
2. DV commits stamp v3 row-lineage: first-row-id recorded,
   next-row-id unchanged.
3. Hudi archive cache holds ONE entry per path (superseded sizes are
   replaced, not accumulated).
4. Multi-part checkpoint detection accepts a complete part set even
   when a retried writer left parts of a different part count behind.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from deltacat_spark.sources.iceberg import (
    IcebergTable,
    delete_where_dv,
    read_iceberg,
    set_iceberg_ref,
    upgrade_iceberg_v2_to_v3,
    write_iceberg,
)


def test_main_branch_ref_advances_on_write(spark):
    root = tempfile.mkdtemp(prefix="ice_refs_adv_")
    df = spark.range(0, 5).select(F.col("id"))
    write_iceberg(df, root)
    set_iceberg_ref(root, "main", kind="branch")
    write_iceberg(
        spark.range(5, 10).select(F.col("id")), root, mode="append"
    )
    meta = IcebergTable(root).metadata()
    assert (
        meta["refs"]["main"]["snapshot-id"] == meta["current-snapshot-id"]
    )
    got = sorted(
        r["id"] for r in read_iceberg(spark, root, ref="main").collect()
    )
    assert got == list(range(10))


def test_dv_commit_stamps_row_lineage(spark):
    root = tempfile.mkdtemp(prefix="ice_dv_lineage_")
    write_iceberg(spark.range(0, 20).select(F.col("id")), root)
    upgrade_iceberg_v2_to_v3(root)
    before = int(IcebergTable(root).metadata().get("next-row-id") or 0)
    assert delete_where_dv(spark, root, "id < 5") is not None
    meta = IcebergTable(root).metadata()
    snap = meta["snapshots"][-1]
    assert snap.get("first-row-id") == before
    assert int(meta.get("next-row-id") or 0) == before


def test_hudi_archive_cache_replaces_entries(tmp_path):
    from deltacat_spark.sources import hudi as H
    from deltacat_spark.sources import hudi_log

    root = str(tmp_path / "tbl")
    d = os.path.join(root, H.HOODIE_DIR, "archived")
    os.makedirs(d)
    p = os.path.join(d, "commits_.archive.1_1-0-1")
    schema = {
        "type": "record",
        "name": "HoodieArchivedMetaEntry",
        "fields": [
            {"name": "commitTime", "type": ["null", "string"]},
            {"name": "actionType", "type": ["null", "string"]},
            {"name": "actionState", "type": ["null", "string"]},
        ],
    }
    hudi_log.append_avro_data_block(
        p,
        [{"commitTime": "001", "actionType": "commit",
          "actionState": "COMPLETED"}],
        schema,
        "001",
    )
    H._ARCHIVE_CACHE.clear()
    assert "001" in H._archived_entries(root)
    n1 = len(H._ARCHIVE_CACHE)
    # grow the archive: the path's entry is REPLACED, never a new key
    hudi_log.append_avro_data_block(
        p,
        [{"commitTime": "002", "actionType": "commit",
          "actionState": "COMPLETED"}],
        schema,
        "002",
    )
    got = H._archived_entries(root)
    assert {"001", "002"} <= set(got)
    assert len(H._ARCHIVE_CACHE) == n1  # one entry per path


# (multi-part checkpoint mixed-part-set acceptance is pinned in
# tests/test_delta_checkpoint_v2.py::test_multipart_mixed_part_sets)
