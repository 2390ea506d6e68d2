"""External Iceberg EQUALITY delete files (content=2): read-time
application + the converter fold (`sources/iceberg.py`).

Reference surface: equality-delete files are the ACTUAL INPUT of the
reference converter (`compute/converter/steps/convert.py:45+` downloads
equality deletes and converts them to position deletes;
`converter_session.py:46-429` commits the result). This suite covers:

* spec application semantics — null-safe match on `equality_ids`
  columns, STRICT sequence scoping (delete seq > data seq), multiple
  equality-id sets, partition-column equality ids;
* `fold_equality_deletes` — the equality→position conversion: reads
  before/after the fold are identical, the folded snapshot carries no
  content=2 entries, and prior snapshots stay time-travelable;
* a randomized model check driving append / equality-delete / fold /
  position-delete sequences against a dict model;
* Appendix D minimal-length decimal serialization (ADVICE r11).
"""

import decimal
import os

import pytest
from pyspark.sql import functions as F

from deltacat_spark.sources import avrofile
from deltacat_spark.sources.iceberg import (
    IcebergTable,
    commit_equality_deletes,
    commit_position_deletes,
    deserialize_single_value,
    fold_equality_deletes,
    read_iceberg,
    serialize_single_value,
    write_iceberg,
)


@pytest.fixture()
def df40(spark):
    return spark.range(0, 40).select(
        "id",
        (F.col("id") % 4).cast("string").alias("cat"),
        (F.col("id") * 0.5).alias("v"),
    )


def _ids(spark, root, **kwargs):
    return sorted(
        r.id for r in read_iceberg(spark, root, **kwargs).collect()
    )


def test_equality_delete_applies_on_read(spark, tmp_path, df40):
    root = str(tmp_path / "t")
    write_iceberg(df40, root)
    dels = spark.createDataFrame([(3,), (7,), (999,)], "id long")
    commit_equality_deletes(spark, root, dels)
    assert _ids(spark, root) == sorted(
        set(range(40)) - {3, 7}
    )
    # the committed entry is spec-shaped: content=2 + equality_ids
    tbl = IcebergTable(root)
    _, eqs = tbl.live_files()
    eq = [d for d in eqs if d.get("content") == 2]
    assert len(eq) == 1
    assert eq[0]["equality_ids"] == [1]  # field id of `id`


def test_equality_delete_strict_sequence_scoping(spark, tmp_path, df40):
    """A later append re-inserting a deleted key must SURVIVE: equality
    deletes apply only to data files with seq strictly below theirs."""
    root = str(tmp_path / "t")
    write_iceberg(df40, root)  # seq 1
    commit_equality_deletes(
        spark, root, spark.createDataFrame([(5,), (6,)], "id long")
    )  # seq 2
    reinsert = spark.range(5, 6).select(
        "id", F.lit("x").alias("cat"), F.lit(9.0).alias("v")
    )
    write_iceberg(reinsert, root, mode="append")  # seq 3
    assert _ids(spark, root) == sorted((set(range(40)) - {5, 6}) | {5})
    row = (
        read_iceberg(spark, root).filter("id = 5").collect()
    )
    assert [r.cat for r in row] == ["x"]  # the seq-3 incarnation


def test_equality_delete_null_safe_and_multi_column(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None), (5, "b")],
        "id long, cat string",
    )
    write_iceberg(df, root)
    # multi-column equality ids, including a NULL match
    dels = spark.createDataFrame(
        [(2, None), (3, "a"), (5, "zzz")], "id long, cat string"
    )
    commit_equality_deletes(spark, root, dels)
    assert _ids(spark, root) == [1, 4, 5]


def test_equality_delete_on_partition_column(spark, tmp_path, df40):
    """equality_ids referencing an identity-partition column work even
    though the data files omit that column (it is reconstructed from
    manifest partition metadata before the anti-join)."""
    root = str(tmp_path / "t")
    write_iceberg(df40, root, partition_by=["cat"])
    dels = spark.createDataFrame([("2",)], "cat string")
    commit_equality_deletes(spark, root, dels)
    assert _ids(spark, root) == sorted(
        i for i in range(40) if i % 4 != 2
    )


def test_equality_delete_rejects_non_schema_column(spark, tmp_path, df40):
    root = str(tmp_path / "t")
    write_iceberg(df40, root)
    with pytest.raises(ValueError, match="not top-level"):
        commit_equality_deletes(
            spark, root, spark.createDataFrame([(1,)], "nope long")
        )


def test_fold_preserves_read_and_drops_equality_entries(
    spark, tmp_path, df40
):
    root = str(tmp_path / "t")
    write_iceberg(df40, root)  # seq 1
    commit_equality_deletes(
        spark, root, spark.createDataFrame([(2,), (4,)], "id long")
    )  # seq 2
    write_iceberg(
        spark.range(4, 5).select(
            "id", F.lit("re").alias("cat"), F.lit(0.0).alias("v")
        ),
        root,
        mode="append",
    )  # seq 3: key 4 reborn — fold must NOT delete it
    commit_position_deletes(
        spark,
        root,
        spark.createDataFrame(
            read_iceberg(spark, root, with_lineage=True)
            .filter("id = 9")
            .select(
                F.col("__ice_fp").alias("file_path"),
                F.col("__ice_pos").alias("pos"),
            )
            .collect()
        ),
    )  # seq 4: a position delete layered on top
    before = _ids(spark, root)
    sid = fold_equality_deletes(spark, root)
    assert sid is not None
    after = _ids(spark, root)
    assert after == before
    tbl = IcebergTable(root)
    _, deletes = tbl.live_files()
    assert all(d.get("content") != 2 for d in deletes)
    # idempotent: nothing left to fold
    assert fold_equality_deletes(spark, root) is None
    # pre-fold snapshots still time-travel (equality applied there)
    hist_ids = [
        s["snapshot-id"] for s in tbl.metadata()["snapshots"]
    ]
    tt = _ids(spark, root, snapshot_id=hist_ids[1])  # post-eq-delete
    assert tt == sorted(set(range(40)) - {2, 4})


def test_fold_rewritten_manifest_is_spec_shaped(spark, tmp_path, df40):
    """The carried-forward delete manifest after a fold holds only
    content=1 entries, marked EXISTING with explicit seqs."""
    root = str(tmp_path / "t")
    write_iceberg(df40, root)
    commit_position_deletes(
        spark,
        root,
        spark.createDataFrame(
            read_iceberg(spark, root, with_lineage=True)
            .filter("id = 0")
            .select(
                F.col("__ice_fp").alias("file_path"),
                F.col("__ice_pos").alias("pos"),
            )
            .collect()
        ),
    )
    commit_equality_deletes(
        spark, root, spark.createDataFrame([(1,)], "id long")
    )
    fold_equality_deletes(spark, root)
    tbl = IcebergTable(root)
    meta = tbl.metadata()
    for mf in tbl.manifests(tbl.snapshot(meta)):
        if mf.get("content") != 1:
            continue
        for e in tbl.manifest_entries(mf["manifest_path"]):
            assert e["data_file"].get("content") != 2
            assert e.get("sequence_number") is not None
    assert _ids(spark, root) == sorted(set(range(40)) - {0, 1})


def test_equality_delete_model_random(spark, tmp_path):
    """Randomized append / equality-delete / fold / position-delete
    sequence vs a dict model keyed by id (last state wins per key)."""
    import random

    rng = random.Random(20260816)
    root = str(tmp_path / "t")
    live: dict[int, str] = {}
    next_id = 0

    def batch(ids, tag):
        return spark.createDataFrame(
            [(i, tag) for i in ids], "id long, cat string"
        )

    first = list(range(next_id, next_id + 8))
    write_iceberg(batch(first, "b0"), root)
    live.update({i: "b0" for i in first})
    next_id = 8
    for step in range(1, 9):
        op = rng.choice(["append", "eqdel", "eqdel", "fold"])
        if op == "append":
            ids = list(range(next_id, next_id + rng.randint(1, 6)))
            # re-insert some previously deleted/live keys too
            ids += rng.sample(range(next_id), min(2, next_id))
            next_id += 6
            write_iceberg(
                batch(sorted(set(ids)), f"b{step}"), root, mode="append"
            )
            live.update({i: f"b{step}" for i in sorted(set(ids))})
        elif op == "eqdel":
            pool = list(range(next_id + 2))
            victims = rng.sample(pool, min(3, len(pool)))
            commit_equality_deletes(
                spark, root, batch(victims, "x").select("id")
            )
            for v in victims:
                live.pop(v, None)
        else:
            fold_equality_deletes(spark, root)
        got = {
            (r.id, r.cat)
            for r in read_iceberg(spark, root).collect()
        }
        assert got == set(live.items()), f"step {step} op {op}"
    fold_equality_deletes(spark, root)
    got = {(r.id, r.cat) for r in read_iceberg(spark, root).collect()}
    assert got == set(live.items())


def test_decimal_single_value_minimal_bytes():
    """Spec Appendix D requires MINIMAL two's-complement length
    (ADVICE r11: -(2^(8k-1)) values got a redundant sign byte)."""
    cases = {
        "0": b"\x00",
        "127": b"\x7f",
        "-128": b"\x80",
        "128": b"\x00\x80",
        "-129": b"\xff\x7f",
        "-32768": b"\x80\x00",
        "255": b"\x00\xff",
    }
    for s, want in cases.items():
        got = serialize_single_value("decimal(10, 0)", decimal.Decimal(s))
        assert got == want, (s, got, want)
        back = deserialize_single_value("decimal(10, 0)", got)
        assert back == decimal.Decimal(s)


def test_partition_scoped_equality_delete(spark, tmp_path, df40):
    """A PARTITIONED equality-delete file applies only within its own
    partition (the spec's partitioned-delete scoping) — rows in other
    partitions matching the equality values must survive; the fold
    honors the same scope."""
    root = str(tmp_path / "t")
    write_iceberg(df40, root, partition_by=["cat"])
    # v = 1.0 identifies id=2 (cat 2) and also exists nowhere else;
    # scope the delete on v-values that appear in MULTIPLE partitions:
    # delete v IN (0.5, 1.0, 1.5) but ONLY within partition cat='1'
    dels = spark.createDataFrame([(0.5,), (1.0,), (1.5,)], "v double")
    commit_equality_deletes(spark, root, dels, partition={"cat": "1"})
    # v=0.5 -> id 1 (cat 1): deleted; v=1.0 -> id 2 (cat 2): SURVIVES;
    # v=1.5 -> id 3 (cat 3): SURVIVES
    assert _ids(spark, root) == sorted(set(range(40)) - {1})
    # manifest shape: the delete entry carries the partition tuple
    tbl = IcebergTable(root)
    _, dels_live = tbl.live_files()
    eq = [d for d in dels_live if d.get("content") == 2]
    assert eq and eq[0]["partition"] == {"cat": "1"}
    # the fold applies the same scope and drops the content=2 entry
    before = _ids(spark, root)
    assert fold_equality_deletes(spark, root) is not None
    assert _ids(spark, root) == before
    _, dels_live = IcebergTable(root).live_files()
    assert all(d.get("content") != 2 for d in dels_live)


def test_partition_scoped_eq_delete_unknown_field_refused(
    spark, tmp_path, df40
):
    root = str(tmp_path / "t")
    write_iceberg(df40, root)
    with pytest.raises(ValueError, match="partition scope"):
        commit_equality_deletes(
            spark,
            root,
            spark.createDataFrame([(1,)], "id long"),
            partition={"nope": "x"},
        )
