"""Randomized model check for the Delta interop surface
(`sources/deltalake.py`): a sequence of append/overwrite commits with
interleaved OPTIMIZE reorganizations is replayed against a plain-Python
model; after every commit the latest read, time travel to every
version, and the reconstructed change feed between any two versions
must all match the model — OPTIMIZE must be invisible everywhere."""

import random

from deltacat_spark.sources.deltalake import (
    optimize_delta,
    read_delta,
    read_delta_changes,
    write_delta,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_delta_random_ops_match_model(spark, tmp_path):
    rng = random.Random(417)
    root = str(tmp_path / "d")
    live: dict[int, tuple[str, float]] = {}  # id -> (cat, v)
    by_version: dict[int, dict] = {}  # version -> model copy
    # version -> ("insert"/"delete", {id: (cat, v)}) change sets
    changes: dict[int, dict[str, dict]] = {}

    next_id = 0
    for step in range(7):
        op = rng.choice(["append", "append", "overwrite", "optimize"])
        if op == "optimize":
            v = optimize_delta(spark, root) if live else None
            if v is None:
                continue  # nothing eligible — not a commit we recorded
            by_version[v] = dict(live)
            changes[v] = {}  # reorganization: silent in the feed
            continue
        rows = [
            (next_id + j, str(rng.randint(0, 2)), float(next_id + j))
            for j in range(rng.randint(2, 6))
        ]
        next_id += len(rows)
        v = write_delta(
            _batch(spark, rows),
            root,
            mode=op,
            partition_by=["cat"] if not by_version else None,
        )
        ch: dict[str, dict] = {
            "insert": {i: (c, x) for i, c, x in rows}
        }
        if op == "overwrite":
            ch["delete"] = dict(live)
            live = {}
        for i, c, x in rows:
            live[i] = (c, x)
        by_version[v] = dict(live)
        changes[v] = ch

        got = {r.id: (r.cat, r.v) for r in read_delta(spark, root).collect()}
        assert got == live, f"latest read diverged at step {step} (v{v})"

    # time travel to every version reproduces that version's model
    for v, snap in by_version.items():
        got = {
            r.id: (r.cat, r.v)
            for r in read_delta(spark, root, version=v).collect()
        }
        assert got == snap, f"time travel to v{v} diverged"

    # change feed over every single-version window matches the model's
    # change sets; OPTIMIZE versions contribute nothing
    for v, ch in changes.items():
        feed = read_delta_changes(spark, root, v, v)
        got: dict[str, dict] = {}
        for r in feed.collect():
            got.setdefault(r._change_type, {})[r.id] = (r.cat, r.v)
        assert got == {k: d for k, d in ch.items() if d}, (
            f"change feed at v{v} diverged"
        )

    # and the full-history feed nets out to the live table
    net: dict[int, tuple[str, float]] = {}
    full = read_delta_changes(spark, root, 0)
    for r in sorted(
        full.collect(), key=lambda r: (r._commit_version, r._change_type)
    ):
        # within a version, deletes sort before inserts ("d" < "i") —
        # matching overwrite semantics (delete old, then insert new)
        if r._change_type == "insert":
            net[r.id] = (r.cat, r.v)
        else:
            net.pop(r.id, None)
    assert net == live, "replaying the full change feed diverged"
