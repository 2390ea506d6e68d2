"""Randomized model check for the Iceberg interop surface
(`sources/iceberg.py`): random append / position-delete /
rewrite-data-files / expire-snapshots steps replayed against a
plain-Python model; after every step the current read matches the
model, incremental windows return exactly each append's rows (rewrites
re-deliver nothing), and expiry never changes the current read."""

import random

from pyspark.sql import functions as F

from deltacat_spark.sources.iceberg import (
    convert_equality_deletes_to_position,
    expire_snapshots,
    read_iceberg,
    read_iceberg_incremental,
    rewrite_data_files,
    write_iceberg,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_iceberg_random_ops_match_model(spark, tmp_path):
    rng = random.Random(733)
    root = str(tmp_path / "t")
    live: dict[int, tuple[str, float]] = {}
    appended: dict[int, dict] = {}  # sequence-number -> that append's rows
    seq = 0

    rows = [(i, str(i % 3), float(i)) for i in range(20)]
    write_iceberg(_batch(spark, rows), root, partition_by=["cat"])
    seq += 1
    live.update({i: (c, v) for i, c, v in rows})
    appended[seq] = {i: (c, v) for i, c, v in rows}
    next_id = 1000

    for step in range(6):
        op = rng.choice(["append", "append", "delete", "rewrite", "expire"])
        if op == "append":
            rows = [
                (next_id + j, str(rng.randint(0, 3)), float(next_id + j))
                for j in range(rng.randint(2, 5))
            ]
            next_id += 100
            write_iceberg(_batch(spark, rows), root)
            seq += 1
            live.update({i: (c, v) for i, c, v in rows})
            appended[seq] = {i: (c, v) for i, c, v in rows}
        elif op == "delete":
            if not live:
                continue
            doomed = rng.sample(sorted(live), k=rng.randint(1, 3))
            convert_equality_deletes_to_position(
                spark, root, f"id IN ({', '.join(map(str, doomed))})"
            )
            seq += 1
            for i in doomed:
                live.pop(i)
        elif op == "rewrite":
            rewrite_data_files(spark, root)
            seq += 1
            # folds deletes; current contents unchanged, no new rows
        else:
            expire_snapshots(root, keep_last=2)
            # metadata-only: seq unchanged, contents unchanged

        got = {
            r.id: (r.cat, r.v) for r in read_iceberg(spark, root).collect()
        }
        assert got == live, f"read diverged after step {step} ({op})"

    # incremental windows: every surviving append snapshot's own window
    # yields exactly the rows it appended (deletes/rewrites/expiry in
    # between never re-deliver or erase history that still exists)
    for s, rows_s in appended.items():
        try:
            inc = read_iceberg_incremental(
                spark, root, s - 1, s, on_non_append="skip"
            )
        except FileNotFoundError:
            continue  # the append's files were expired with its snapshot
        got = {r.id: (r.cat, r.v) for r in inc.collect()}
        if got == {}:
            continue  # snapshot expired out of the metadata
        assert got == rows_s, f"incremental window ({s-1}, {s}] diverged"

    # full-window incremental (appends only) delivers exactly the union
    # of every SURVIVING append snapshot's rows — later deletes don't
    # erase delivery history, expiry removes exactly its snapshots' rows
    all_inc = read_iceberg_incremental(
        spark, root, 0, on_non_append="skip"
    )
    seen = {r.id: (r.cat, r.v) for r in all_inc.collect()}
    surviving = _surviving_seqs(root)
    expected = {}
    for s, rows_s in appended.items():
        if s in surviving:
            expected.update(rows_s)
    assert seen == expected


def _surviving_seqs(root):
    from deltacat_spark.sources.iceberg import IcebergTable

    return {
        s["sequence-number"]
        for s in IcebergTable(root).metadata().get("snapshots", [])
    }
