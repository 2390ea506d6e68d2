"""External spec-compliant Iceberg tables store absolute `file://`
URIs for manifest lists, manifests, and data/delete files (this
writer's root-relative paths are a documented relocatability
deviation). The reader must accept BOTH: these tests rewrite a
self-written table's control plane to absolute URIs — the shape a
real external writer produces — and require snapshot reads, position
deletes, incremental reads, and maintenance to keep working."""

import json
import os

from pyspark.sql import functions as F

from deltacat_spark.sources import avrofile
from deltacat_spark.sources.iceberg import (
    IcebergTable,
    commit_position_deletes,
    expire_snapshots,
    find_positions_for_predicate,
    read_iceberg,
    read_iceberg_incremental,
    remove_orphan_files,
    write_iceberg,
)


def _to_absolute_uris(root: str) -> None:
    """Rewrite every path in the current metadata's control plane to
    an absolute file:// URI (what external writers store)."""
    tbl = IcebergTable(root)
    meta = tbl.metadata()

    def uri(rel: str) -> str:
        if rel.startswith("file://") or rel.startswith("/"):
            return rel
        return "file://" + os.path.join(root, rel)

    for snap in meta.get("snapshots", []):
        ml_rel = snap["manifest-list"]
        ml_abs = os.path.join(root, ml_rel) if not ml_rel.startswith("/") else ml_rel
        lschema, lrows = avrofile.read_container(ml_abs)
        for m in lrows:
            mpath = m["manifest_path"]
            mabs = (
                os.path.join(root, mpath)
                if not mpath.startswith("/")
                else mpath
            )
            eschema, erows = avrofile.read_container(mabs)
            for e in erows:
                e["data_file"]["file_path"] = uri(
                    e["data_file"]["file_path"]
                )
            avrofile.write_container(mabs, eschema, erows)
            m["manifest_path"] = uri(mpath)
        avrofile.write_container(ml_abs, lschema, lrows)
        snap["manifest-list"] = uri(ml_rel)
    v = tbl.current_version()
    with open(
        os.path.join(root, "metadata", f"v{v}.metadata.json"), "w"
    ) as f:
        json.dump(meta, f)


def test_absolute_uri_table_reads_back(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 60).select(
        "id", (F.col("id") % 3).cast("string").alias("cat"),
        (F.col("id") * 0.5).alias("v"),
    )
    write_iceberg(df, root, partition_by=["cat"])
    write_iceberg(
        spark.range(100, 110).select(
            "id", F.lit("9").alias("cat"), F.lit(1.0).alias("v")
        ),
        root,
        mode="append",
    )
    before = sorted(map(tuple, read_iceberg(spark, root).collect()))
    _to_absolute_uris(root)
    after = sorted(map(tuple, read_iceberg(spark, root).collect()))
    assert after == before
    # incremental over absolute-URI manifests
    inc = read_iceberg_incremental(spark, root, from_sequence=1)
    assert sorted(r.id for r in inc.collect()) == list(range(100, 110))


def test_absolute_uri_position_deletes_apply(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg(
        spark.range(0, 40).select(
            "id", (F.col("id") * 2.0).alias("v")
        ),
        root,
    )
    _to_absolute_uris(root)
    # find+commit against the absolute-URI table (the delete parquet
    # stores root-relative coordinates; the committed manifests stay
    # this writer's relative shape — a MIXED table, the hardest case)
    pos = find_positions_for_predicate(spark, root, "id < 5")
    commit_position_deletes(spark, root, pos)
    got = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert got == list(range(5, 40))


def test_absolute_uri_expire_and_orphans_keep_live_files(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    write_iceberg(spark.range(0, 20).select("id"), root)
    write_iceberg(
        spark.range(20, 30).select("id"), root, mode="overwrite"
    )
    _to_absolute_uris(root)
    expire_snapshots(root, keep_last=1)
    remove_orphan_files(root, older_than_s=0.0)
    # live files of the retained snapshot must have survived both
    got = sorted(r.id for r in read_iceberg(spark, root).collect())
    assert got == list(range(20, 30))
