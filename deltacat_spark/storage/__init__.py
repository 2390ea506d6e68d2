"""Table-format storage layer: commit log, snapshots, MVCC transactions.

Delta-Lake-style (PAPERS.md: "Delta Lake: High-Performance ACID Table
Storage over Cloud Object Stores", VLDB 2020) re-expression of the
reference's metafile-revision MVCC (`storage/model/transaction.py`,
`metafile.py:53-468`): an append-only, version-numbered JSON commit log
per table with put-if-absent commits, optimistic conflict detection,
and log-replay snapshots with time travel.
"""

from deltacat_spark.storage.commit import (
    Commit,
    CommitConflictError,
    CommitLog,
    DeltaType,
)
from deltacat_spark.storage.snapshot import Snapshot

__all__ = [
    "Commit",
    "CommitConflictError",
    "CommitLog",
    "DeltaType",
    "Snapshot",
]
