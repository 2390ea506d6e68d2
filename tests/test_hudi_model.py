"""Randomized model check for the Hudi CoW writer (`sources/hudi.py`):
a sequence of insert/upsert batches over a partitioned table is
replayed against a plain-Python dict model keyed by
(record_key, partition); after every commit the snapshot read must
match the model exactly, time travel to any earlier instant must match
that instant's model snapshot, and the incremental pull between any
two instants must return exactly the rows that commit wrote — even
when copy-on-write slice rewrites carried untouched rows along.
"""

import random

from pyspark.sql import functions as F

from deltacat_spark.sources.hudi import (
    file_slices,
    read_hudi,
    read_hudi_incremental,
    write_hudi,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_hudi_random_ops_match_model(spark, tmp_path):
    rng = random.Random(901)
    root = str(tmp_path / "h")
    model: dict[int, tuple[str, float]] = {}  # id -> (cat, v)
    snapshots: list[tuple[str, dict]] = []  # (instant, model copy)
    wrote: list[tuple[str, dict]] = []  # (instant, rows that commit wrote)

    # first commit is an insert of fresh keys
    rows = [(i, str(i % 3), float(i)) for i in range(0, 30)]
    i0 = write_hudi(
        _batch(spark, rows), root, record_key_field="id",
        operation="insert", partition_by=["cat"],
    )
    for i, c, v in rows:
        model[i] = (c, v)
    snapshots.append((i0, dict(model)))
    wrote.append((i0, {i: (c, v) for i, c, v in rows}))

    for step in range(4):
        # upsert batch: mix of updates to random existing keys (same
        # partition — hudi CoW semantics match within the file group)
        # and brand-new keys
        upd_keys = rng.sample(sorted(model), k=rng.randint(2, 8))
        new_lo = 1000 * (step + 1)
        batch = [
            (k, model[k][0], model[k][1] + 100.0 * (step + 1))
            for k in upd_keys
        ] + [
            (new_lo + j, str(rng.randint(0, 3)), float(new_lo + j))
            for j in range(rng.randint(1, 5))
        ]
        inst = write_hudi(
            _batch(spark, batch), root, record_key_field="id"
        )
        for i, c, v in batch:
            model[i] = (c, v)
        snapshots.append((inst, dict(model)))
        wrote.append((inst, {i: (c, v) for i, c, v in batch}))

        got = {
            r.id: (r.cat, r.v) for r in read_hudi(spark, root).collect()
        }
        assert got == model, f"snapshot mismatch after step {step}"

    # time travel: every recorded instant reproduces its model snapshot
    for inst, snap in snapshots:
        got = {
            r.id: (r.cat, r.v)
            for r in read_hudi(spark, root, as_of=inst).collect()
        }
        assert got == snap, f"time travel to {inst} diverged"

    # incremental pulls: (instant_{k-1}, instant_k] returns exactly what
    # commit k wrote, despite CoW rewrites carrying old rows in-slice
    for k in range(1, len(snapshots)):
        begin = snapshots[k - 1][0]
        end = snapshots[k][0]
        inc = read_hudi_incremental(
            spark, root, begin_instant=begin, end_instant=end,
            drop_meta=True,
        )
        got = {r.id: (r.cat, r.v) for r in inc.collect()}
        assert got == wrote[k][1], f"incremental ({begin},{end}] wrong"

    # structural invariant: one live slice per file group, and every
    # untouched group's path is stable across the whole history
    slices = file_slices(root)
    assert len({s["file_id"] for s in slices}) == len(slices)


def test_hudi_upsert_moves_nothing_on_noop(spark, tmp_path):
    """Upserting an empty-intersection batch leaves every existing
    slice path untouched (pure new-group append)."""
    root = str(tmp_path / "h")
    write_hudi(
        _batch(spark, [(i, str(i % 2), 1.0) for i in range(10)]),
        root, record_key_field="id", operation="insert",
        partition_by=["cat"],
    )
    before = {s["file_id"]: s["path"] for s in file_slices(root)}
    write_hudi(
        _batch(spark, [(100, "0", 2.0)]), root, record_key_field="id"
    )
    after = {s["file_id"]: s["path"] for s in file_slices(root)}
    for fid, path in before.items():
        assert after[fid] == path
    assert read_hudi(spark, root).count() == 11
