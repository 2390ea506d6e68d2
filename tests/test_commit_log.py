"""Commit-protocol tests (reference conflict semantics:
`transaction.py:1561-1571`, `metafile.py:271`)."""

import pytest

from deltacat_spark.storage.commit import Commit, CommitConflictError, CommitLog


def test_put_if_absent(tmp_path):
    log = CommitLog(str(tmp_path))
    assert log.try_commit(Commit(version=1, operation="CREATE"))
    assert not log.try_commit(Commit(version=1, operation="CREATE"))
    assert log.latest_version() == 1


def test_append_rebases_over_append(tmp_path):
    log = CommitLog(str(tmp_path))
    log.try_commit(Commit(version=1, operation="CREATE"))
    log.try_commit(Commit(version=2, operation="APPEND"))
    c = Commit(version=2, operation="APPEND")
    out = log.commit(c)
    assert out.version == 3
    assert out.stream_position == 3  # ordered appends track version


def test_merge_conflict_raises(tmp_path):
    log = CommitLog(str(tmp_path))
    log.try_commit(Commit(version=1, operation="CREATE"))
    log.try_commit(Commit(version=2, operation="APPEND"))
    with pytest.raises(CommitConflictError):
        log.commit(Commit(version=2, operation="MERGE"))


def test_append_does_not_rebase_over_merge(tmp_path):
    log = CommitLog(str(tmp_path))
    log.try_commit(Commit(version=1, operation="CREATE"))
    log.try_commit(Commit(version=2, operation="MERGE"))
    with pytest.raises(CommitConflictError):
        log.commit(Commit(version=2, operation="APPEND"))


def test_replay_and_time_travel(tmp_path):
    log = CommitLog(str(tmp_path))
    log.try_commit(Commit(version=1, operation="CREATE", timestamp_ms=100))
    log.try_commit(
        Commit(
            version=2,
            operation="APPEND",
            timestamp_ms=200,
            actions=[{"add": {"path": "a.parquet", "records": 1}}],
        )
    )
    log.try_commit(
        Commit(
            version=3,
            operation="APPEND",
            timestamp_ms=300,
            actions=[{"add": {"path": "b.parquet", "records": 1}}],
        )
    )
    assert [c.version for c in log.replay()] == [1, 2, 3]
    assert [c.version for c in log.replay(version_as_of=2)] == [1, 2]
    assert [c.version for c in log.replay(timestamp_as_of=250)] == [1, 2]
