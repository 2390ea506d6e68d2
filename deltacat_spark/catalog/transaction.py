"""Interactive multi-operation transactions.

Reference semantics (`transaction.py:768-932,1432-1639`; ambient txn
joins `catalog/main/impl.py:264-266,460-463`): multiple reads/writes
participate in one transaction; reads are snapshot-pinned at txn start
(snapshot isolation / time travel, `transaction.py:727-766`) and see the
transaction's own uncommitted writes (read-your-writes); the commit is
atomic.

Spark-first realization:
* writes are *buffered as DataFrame plans* — no files move until seal;
* reads compose the pinned snapshot with the buffered plans using the
  same merge/delete/append operators the write path uses;
* at seal, consecutive append-family writes to the same table coalesce
  into ONE commit (atomic for the dominant multi-batch-load case);
  merge/delete seal through the normal CoW/MoR path;
* a seal spanning MULTIPLE tables is atomic via the catalog-level
  two-phase marker protocol (`storage/commit.py:TxnMarkers`, mirroring
  reference `storage/model/transaction.py:1432-1639`): every per-table
  commit is stamped `pending_txn` (invisible to readers), and one atomic
  marker rename makes them ALL visible — a crash or error mid-seal
  leaves NO table changed.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame

from deltacat_spark.operators.merge import equality_delete, upsert


@dataclass
class _Op:
    df: DataFrame
    table: str
    namespace: str
    mode: str
    kwargs: dict = dc_field(default_factory=dict)


class Transaction:
    def __init__(self, catalog):
        self.catalog = catalog
        self.ops: list[_Op] = []
        self._pins: dict[tuple[str, str], int] = {}
        self.sealed = False

    # -- buffered writes ----------------------------------------------
    def write(
        self,
        df: DataFrame,
        table: str,
        namespace: str = "default",
        mode: str = "auto",
        **kwargs: Any,
    ) -> None:
        assert not self.sealed, "transaction already sealed"
        self.ops.append(_Op(df, table, namespace, mode, kwargs))

    # -- reads: pinned snapshot + overlay of buffered writes ----------
    def _pin(self, table: str, namespace: str) -> int | None:
        key = (namespace, table)
        if key not in self._pins:
            try:
                self._pins[key] = self.catalog.snapshot(table, namespace).version
            except FileNotFoundError:
                self._pins[key] = -1
        v = self._pins[key]
        return None if v < 0 else v

    def read(self, table: str, namespace: str = "default") -> DataFrame:
        pin = self._pin(table, namespace)
        base = None
        schema = None
        if pin is not None:
            snap = self.catalog.snapshot(table, namespace, version_as_of=pin)
            schema = snap.schema
            base = self.catalog._read_files(snap, snap.files)
            if schema is not None:
                base = schema.read_projection(base)
        for op in self.ops:
            if (op.table, op.namespace) != (table, namespace):
                continue
            batch = op.df
            if base is None:
                base = batch
                continue
            mode = op.mode
            keys = schema.merge_keys if schema else []
            if mode == "auto":
                mode = "merge" if keys else "append"
            if mode in ("append", "add", "chrono"):
                base = base.unionByName(batch, allowMissingColumns=True)
            elif mode == "merge":
                base = upsert(base, batch, keys)
            elif mode == "delete":
                cols = [c for c in batch.columns if c in base.columns]
                base = equality_delete(base, batch, cols)
            elif mode == "replace":
                base = batch
        if base is None:
            raise FileNotFoundError(f"{namespace}.{table}")
        return base

    # -- seal ----------------------------------------------------------
    def seal(self) -> None:
        assert not self.sealed
        self.sealed = True
        tables = {(op.namespace, op.table) for op in self.ops}
        if len(tables) > 1:
            # Cross-table atomic seal: stamp every commit pending, flip
            # one marker at the end. Abort (or crash — the marker stays
            # "pending"/"aborted") leaves every table unchanged.
            txn_id = uuid.uuid4().hex
            markers = self.catalog._txn_markers
            markers.begin(txn_id)
            self.catalog._txn_ctx = txn_id
            try:
                self._seal_ops()
            except BaseException:
                self.catalog._txn_ctx = None
                markers.abort(txn_id)
                raise
            self.catalog._txn_ctx = None
            markers.finalize(txn_id)
            return
        self._seal_ops()

    def _seal_ops(self) -> None:
        i = 0
        while i < len(self.ops):
            op = self.ops[i]
            # Coalesce consecutive append-family writes to one table into
            # a single atomic commit.
            if op.mode in ("append", "add"):
                j = i
                batch = op.df
                while (
                    j + 1 < len(self.ops)
                    and self.ops[j + 1].table == op.table
                    and self.ops[j + 1].namespace == op.namespace
                    and self.ops[j + 1].mode == op.mode
                ):
                    j += 1
                    batch = batch.unionByName(
                        self.ops[j].df, allowMissingColumns=True
                    )
                self.catalog.write_to_table(
                    batch, op.table, op.namespace, mode=op.mode, **op.kwargs
                )
                i = j + 1
            else:
                self.catalog.write_to_table(
                    op.df, op.table, op.namespace, mode=op.mode, **op.kwargs
                )
                i += 1

    def __enter__(self) -> "Transaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.seal()
        # on error: buffered plans are discarded — nothing was committed
