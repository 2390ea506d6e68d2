"""Checkpoint-scale guard (SURVEY "What's hard" #5): snapshot resolution
at ~10^3 commits must go through the checkpoint — bounded metadata reads
(O(tail), not O(all commits)) and sub-second wall time. The read-count
assertion rides the fs seam, so a regression that silently reverts to
full-log replay fails loudly."""

import time

import pytest

from deltacat_spark.catalog import Catalog
from deltacat_spark.storage.commit import Commit
from deltacat_spark.storage.fs import LocalFS

N_COMMITS = 1_000


class CountingFS(LocalFS):
    def __init__(self):
        self.reads = 0

    def read_text(self, path: str) -> str:
        self.reads += 1
        return super().read_text(path)


@pytest.mark.slow
def test_snapshot_resolution_bounded_by_checkpoint(spark, tmp_path):
    fs = CountingFS()
    cat = Catalog(spark, str(tmp_path / "cat"), fs=fs)
    cat.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t", mode="auto"
    )
    log = cat._log("t", "default")
    base = log.latest_version()
    # Synthesize 1,000 small appends straight into the log — the
    # metadata plane is what's under test, not the parquet writer.
    for i in range(N_COMMITS):
        ok = log.try_commit(
            Commit(
                version=base + 1 + i,
                operation="APPEND",
                delta_type="APPEND",
                actions=[
                    {
                        "add": {
                            "path": f"data/synth/f{i}.parquet",
                            "records": 10,
                            "bytes": 100,
                        }
                    }
                ],
            )
        )
        assert ok
    # First resolution replays the whole log once and persists a
    # checkpoint at the head (lazy checkpointing).
    snap = cat.snapshot("t")
    assert snap.version == base + N_COMMITS
    assert log.checkpoints(), "resolution should have written a checkpoint"
    assert log.checkpoints()[-1] == snap.version

    # Steady state: resolution = checkpoint + tail, NOT 1,000 commit reads.
    fs.reads = 0
    t0 = time.monotonic()
    snap2 = cat.snapshot("t")
    dt = time.monotonic() - t0
    assert snap2.version == snap.version
    assert len(snap2.files) >= N_COMMITS
    assert fs.reads <= 25, (
        f"snapshot resolution read {fs.reads} metadata files — "
        "checkpoint not bounding the replay"
    )
    assert dt < 1.0, f"snapshot resolution took {dt:.2f}s at 10^3 commits"

    # A few more commits: still bounded by the tail, and time travel to a
    # pre-checkpoint version still resolves (full replay fallback).
    for i in range(5):
        log.try_commit(
            Commit(
                version=snap.version + 1 + i,
                operation="APPEND",
                delta_type="APPEND",
                actions=[{"add": {"path": f"data/synth/post{i}.parquet"}}],
            )
        )
    fs.reads = 0
    snap3 = cat.snapshot("t")
    assert snap3.version == snap.version + 5
    assert fs.reads <= 25
    old = cat.snapshot("t", version_as_of=base + 10)
    assert len(old.files) == 11  # initial file + 10 synthetic adds


N_COMMITS_10K = 10_000


@pytest.mark.slow
def test_checkpoint_lifecycle_at_10k(spark, tmp_path):
    """Directive r6→r7: at 10^4 commits, (a) resolution stays ≤25
    metadata reads, (b) checkpoints follow the CADENCE (one per
    `checkpoint.interval`, not one per resolution), and (c) the
    checkpoint-file count stays bounded (write-time pruning keeps the
    newest 3; vacuum is the backstop)."""
    fs = CountingFS()
    cat = Catalog(spark, str(tmp_path / "cat"), fs=fs)
    cat.write_to_table(
        spark.createDataFrame([(1,)], "id long"), "t", mode="auto"
    )
    log = cat._log("t", "default")
    base = log.latest_version()
    interval = 20  # DEFAULT_PROPERTIES["checkpoint.interval"]
    for i in range(N_COMMITS_10K):
        assert log.try_commit(
            Commit(
                version=base + 1 + i,
                operation="APPEND",
                delta_type="APPEND",
                actions=[
                    {
                        "add": {
                            "path": f"data/synth/f{i}.parquet",
                            "records": 1,
                            "bytes": 10,
                        }
                    }
                ],
            )
        )
        # resolve every few commits like a live table would; cadence
        # means MOST of these resolutions write no checkpoint
        if i % 7 == 0:
            cat.snapshot("t")
    # (c) bounded count — write-time pruning, no vacuum needed
    assert len(log.checkpoints()) <= 3, log.checkpoints()
    # (b) cadence: the newest checkpoint trails the head by < interval
    head = log.latest_version()
    assert head - log.checkpoints()[-1] < interval + 1

    # (a) steady-state resolution: checkpoint + tail, ≤25 reads, <1s
    cat.snapshot("t")  # persist a head checkpoint if due
    fs.reads = 0
    t0 = time.monotonic()
    snap = cat.snapshot("t")
    dt = time.monotonic() - t0
    assert snap.version == base + N_COMMITS_10K
    assert len(snap.files) >= N_COMMITS_10K
    assert fs.reads <= 25, (
        f"resolution read {fs.reads} metadata files at 10^4 commits"
    )
    assert dt < 1.0, f"snapshot resolution took {dt:.2f}s at 10^4 commits"

    # pre-checkpoint time travel still resolves via full replay
    old = cat.snapshot("t", version_as_of=base + 10)
    assert len(old.files) == 11

    # vacuum backstop: plant stale checkpoints, real run sweeps them
    import json as _json

    for v in (5, 6, 7):
        fs.write_text_atomic(
            fs.join(log.log_dir, f"{v:020d}.checkpoint.json"),
            _json.dumps({"version": v}),
        )
    assert len(log.checkpoints()) > 3
    cat.vacuum("t", dry_run=True)
    assert len(log.checkpoints()) > 3  # dry run touches nothing
    cat.vacuum("t", min_age_seconds=0)
    assert len(log.checkpoints()) <= 3
