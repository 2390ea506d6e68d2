"""Incremental materialized-view maintenance over the change feed.

`refresh_incremental(catalog, src, dst, transform)` keeps ``dst`` equal
to ``transform(read_table(src))`` by applying ``transform`` to ONLY the
commits that landed since the last refresh (`Catalog.read_changes`) and
appending the derived rows — O(new data) per refresh, never O(table).
The source high-water version rides the SAME commit as the derived rows
(`write_to_table(commit_properties=...)`), so a crash between "data
written" and "watermark recorded" is impossible by construction: either
both are visible or neither is (the reference has no view maintenance;
this is the lakehouse-native derived-table pattern the CDC surface in
SURVEY §2.1/§2.6 exists to enable).

Scope: ``transform`` must be record-wise (projections/filters/derived
columns — distributive over unions). When the since-last-refresh window
contains non-append commits (MERGE/DELETE CDC rows) or the watermark is
missing/corrupt, the refresh falls back to a full REPLACE rebuild —
exact for any transform, idempotent on crash-retry. Aggregating views
should materialize from the full table or use Structured Streaming
(`streaming/api.py:stream_read_changes`) with stateful operators.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

MV_SRC_VERSION = "mv.src_version"


def refresh_incremental(
    catalog: Any,
    src: str,
    dst: str,
    transform: "Callable[[DataFrame], DataFrame]",
    namespace: str = "default",
    record_wise: bool = True,
) -> dict[str, Any]:
    """Refresh ``dst`` from ``src``; returns a small audit dict.

    ``record_wise=False`` declares the transform NOT distributive over
    unions (aggregates/joins/distinct): the incremental append path is
    skipped entirely and every refresh is a full REPLACE rebuild —
    exact for any transform. The watermark still short-circuits no-op
    refreshes."""
    src_snap = catalog.snapshot(src, namespace)
    last: int | None = None
    if catalog.table_exists(dst, namespace):
        dst_props = catalog.snapshot(dst, namespace).properties
        raw = dst_props.get(MV_SRC_VERSION)
        if raw is not None:
            try:
                last = int(raw)
            except ValueError:
                last = None
    if last is not None and last >= src_snap.version:
        return {"mode": "noop", "src_version": src_snap.version}

    if last is not None and record_wise:
        # Soundness check on the COMMIT LOG, not the change rows: a CoW
        # MERGE without CDC sidecars produces no read_changes rows at
        # all, so "every change row is an insert" would silently miss
        # updates. Insert-family deltas and content-neutral maintenance
        # commits (ALTER/ANALYZE/OPTIMIZE) are safe; anything else
        # (MERGE/DELETE/REPLACE/TRUNCATE) forces a rebuild.
        benign_ops = {"ALTER", "ANALYZE", "OPTIMIZE"}
        insert_deltas = {"APPEND", "ADD", "CHRONO"}
        window = catalog._log(src, namespace).replay(
            src_snap.version, start_after=last
        )
        if all(
            c.operation in benign_ops or c.delta_type in insert_deltas
            for c in window
        ):
            changes = catalog.read_changes(
                src, from_version=last, to_version=src_snap.version,
                namespace=namespace,
            )
            batch = changes.drop("_commit_version", "_change_type", "_change_cols")
            out = transform(batch)
            catalog.write_to_table(
                out,
                dst,
                namespace,
                mode="add",
                commit_properties={MV_SRC_VERSION: str(src_snap.version)},
            )
            return {
                "mode": "incremental",
                "src_version": src_snap.version,
                "since": last,
            }

    # Bootstrap / fallback: full rebuild. REPLACE then stamp the
    # watermark; a crash in between re-runs the (idempotent) rebuild.
    out = transform(catalog.read_table(src, namespace))
    if catalog.table_exists(dst, namespace):
        catalog.write_to_table(out, dst, namespace, mode="replace")
    else:
        catalog.write_to_table(out, dst, namespace, mode="auto")
    catalog.alter_table(
        dst, namespace, properties={MV_SRC_VERSION: str(src_snap.version)}
    )
    return {"mode": "full", "src_version": src_snap.version}


def stream_refresh_incremental(
    catalog: Any,
    src: str,
    dst: str,
    transform: "Callable[[DataFrame], DataFrame]",
    checkpoint_dir: str,
    namespace: str = "default",
    trigger_once: bool = True,
):
    """Streaming materialized view: `refresh_incremental`'s contract
    driven by the change-feed source (`streaming/api.py:
    stream_read_changes`). Each micro-batch (a deterministic range of
    commit versions, checkpointed by Spark) transforms and appends in
    ONE commit that also records the batch's high-water source version —
    so although foreachBatch is at-least-once, a replayed batch sees its
    own watermark already recorded and skips: exactly-once end to end.
    (The guard is whole-batch: it also absorbs a LOST checkpoint as
    long as no new source commits landed since; a lost checkpoint plus
    new commits re-reads from version 0 into one overlapping batch —
    restart from the batch `refresh_incremental` watermark instead.)

    Insert-family commits only (APPEND/ADD/CHRONO): a MERGE/DELETE
    change in the feed raises and stops the query — rebuild with the
    batch `refresh_incremental` (record-wise streaming IVM over updates
    would need retraction semantics the sink doesn't have).
    Returns the StreamingQuery.
    """
    from pyspark.sql import functions as F
    from deltacat_spark.streaming.api import stream_read_changes

    changes = stream_read_changes(catalog, src, namespace)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        kinds = {
            r.k
            for r in batch_df.select(
                F.col("_change_type").alias("k")
            ).distinct().collect()
        }
        if not kinds <= {"APPEND", "ADD", "CHRONO"}:
            raise ValueError(
                f"stream_refresh_incremental: non-insert changes {kinds} in "
                "the feed; run the batch refresh_incremental (it rebuilds)"
            )
        hi = batch_df.agg(F.max("_commit_version").alias("h")).collect()[0].h
        if catalog.table_exists(dst, namespace):
            raw = catalog.snapshot(dst, namespace).properties.get(
                MV_SRC_VERSION
            )
            if raw is not None and int(raw) >= int(hi):
                return  # replayed batch — already applied atomically
        out = transform(batch_df.drop("_commit_version", "_change_type", "_change_cols"))
        if not catalog.table_exists(dst, namespace):
            catalog.write_to_table(out, dst, namespace, mode="auto")
            catalog.alter_table(
                dst, namespace, properties={MV_SRC_VERSION: str(hi)}
            )
        else:
            catalog.write_to_table(
                out,
                dst,
                namespace,
                mode="add",
                commit_properties={MV_SRC_VERSION: str(hi)},
            )

    writer = (
        changes.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
