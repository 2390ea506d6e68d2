"""Streaming operators + the streaming table sink.

* `stream_write_to_table` — a `foreachBatch` sink committing each
  micro-batch as an ADD/CHRONO commit into the table format (the
  reference's Ray datasink pattern — executors write files, the driver
  commits metadata once per batch, `io/datasink/deltacat_datasink.py:84-207`
  — is exactly Spark's foreachBatch contract).
* window aggregations — tumbling / sliding / session, usable both on
  streams (with `withWatermark` handling late data like the reference's
  stream watermark) and on batch DataFrames (same code path, which is
  how the correctness gate checks them against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_watermark_if_streaming(df: DataFrame, event_time: str, delay: str) -> DataFrame:
    return df.withWatermark(event_time, delay) if df.isStreaming else df


def tumbling_window_agg(
    df: DataFrame,
    event_time: str,
    duration: str,
    group_by: list[str],
    aggs: list[Column],
    watermark_delay: str | None = None,
) -> DataFrame:
    if watermark_delay and df.isStreaming:
        df = df.withWatermark(event_time, watermark_delay)
    return df.groupBy(F.window(event_time, duration), *group_by).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    event_time: str,
    duration: str,
    slide: str,
    group_by: list[str],
    aggs: list[Column],
    watermark_delay: str | None = None,
) -> DataFrame:
    if watermark_delay and df.isStreaming:
        df = df.withWatermark(event_time, watermark_delay)
    return df.groupBy(F.window(event_time, duration, slide), *group_by).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    event_time: str,
    gap: str,
    group_by: list[str],
    aggs: list[Column],
    watermark_delay: str | None = None,
) -> DataFrame:
    if watermark_delay and df.isStreaming:
        df = df.withWatermark(event_time, watermark_delay)
    return df.groupBy(F.session_window(event_time, gap), *group_by).agg(*aggs)


def dedupe_stream(
    df: DataFrame,
    keys: list[str],
    event_time: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Key dedupe for streams (ingestion-side exact dedup).

    With `event_time` + `watermark_delay` on a stream, uses
    `dropDuplicatesWithinWatermark`: per-key state is EVICTED once the
    watermark passes, so state stays bounded by the delay window — the
    only shape that survives an unbounded stream. Duplicates arriving
    farther apart than the delay are treated as distinct, which is the
    documented contract (same tradeoff as the reference's stream
    watermark, SURVEY §2.6). Without an event time, falls back to exact
    `dropDuplicates` — unbounded state, only for bounded key spaces.
    Works identically on batch DataFrames (no-op watermark).
    """
    if event_time and watermark_delay and df.isStreaming:
        return df.withWatermark(
            event_time, watermark_delay
        ).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_read_appends(
    catalog,
    table: str,
    namespace: str = "default",
) -> DataFrame:
    """Streaming read of an append-only catalog table.

    A parquet file stream over the table's data directory — each newly
    committed file becomes stream input. Sound for APPEND/ADD/CHRONO
    tables (files are immutable-once-committed); tables with CoW
    rewrites (MERGE/DELETE/OPTIMIZE) would replay rewritten rows, so
    this guards against them at call time.
    """
    snap = catalog.snapshot(table, namespace)
    from deltacat_spark.storage.commit import DeltaType

    bad = [
        f.path
        for f in snap.files
        if f.delta_type
        not in (DeltaType.APPEND, DeltaType.ADD, DeltaType.CHRONO)
    ]
    if bad:
        raise ValueError(
            f"{namespace}.{table} has non-append files (CoW rewrites or "
            "MoR deltas); streaming reads support append-only tables"
        )
    assert snap.schema is not None, "streaming read requires a schema"
    import os

    data_glob = os.path.join(catalog._table_root(table, namespace), "data", "*")
    return (
        catalog.spark.readStream.schema(snap.schema.to_struct_type())
        .option("recursiveFileLookup", "true")
        .parquet(data_glob)
    )


def stream_read_changes(
    catalog,
    table: str,
    namespace: str = "default",
    from_version: int = 0,
    on_positional_delete: str = "fail",
) -> DataFrame:
    """Streaming CDC read: the table's commit log as a micro-batch
    source. Each commit's change rows (delta files or `cdc.enabled`
    sidecars) arrive exactly once, stamped `_commit_version` /
    `_change_type` — offsets are commit versions checkpointed by Spark,
    so recovery replays a deterministic range of an immutable log
    (see `streaming/cdc_source.py` for the full semantics, including
    multi-table-txn gating and the positional-delete policy)."""
    from deltacat_spark.streaming.cdc_source import (
        FORMAT_NAME,
        TableChangesDataSource,
    )

    catalog.spark.dataSource.register(TableChangesDataSource)
    return (
        catalog.spark.readStream.format(FORMAT_NAME)
        .option("root", catalog.root)
        .option("table", table)
        .option("namespace", namespace)
        .option("from_version", str(from_version))
        .option("on_positional_delete", on_positional_delete)
        .load()
    )


def stream_read_hudi(
    spark,
    root: str,
    from_instant: str = "",
    max_instants_per_trigger: int | None = None,
    pacing_floor_dir: str | None = None,
) -> DataFrame:
    """Streaming incremental read of a jar-free Hudi CoW table
    (`sources/hudi.py`): offsets are timeline instants; each
    micro-batch delivers exactly the rows the instants in range wrote,
    stamped `_commit_instant` (see `streaming/lakehouse_source.py`).
    `max_instants_per_trigger` paces a continuous query — at most N
    timeline instants per micro-batch (Hudi's read-rate-limit
    convention); delivery stays exactly-once. `pacing_floor_dir` (r14)
    persists the pacing floor across restarts so the FIRST post-restart
    batch over a backlog is capped too — point it at a query-private
    dir next to the checkpointLocation."""
    from deltacat_spark.streaming.lakehouse_source import (
        HUDI_FORMAT_NAME,
        HudiIncrementalDataSource,
    )

    spark.dataSource.register(HudiIncrementalDataSource)
    reader = (
        spark.readStream.format(HUDI_FORMAT_NAME)
        .option("root", root)
        .option("from_instant", from_instant)
    )
    if max_instants_per_trigger is not None:
        reader = reader.option(
            "max_instants_per_trigger", str(max_instants_per_trigger)
        )
    if pacing_floor_dir is not None:
        reader = reader.option("pacing_floor_dir", pacing_floor_dir)
    return reader.load()


def stream_read_delta(
    spark,
    root: str,
    from_version: int = -1,
    on_remove: str = "fail",
) -> DataFrame:
    """Streaming read of a jar-free Delta table's append log
    (`sources/deltalake.py`): offsets are log versions; each
    micro-batch delivers the versions' added files with hive-staged
    partition columns reconstructed, stamped `_commit_version`.
    Versions that remove files fail the stream (or skip with
    `on_remove='skip'`)."""
    from deltacat_spark.streaming.lakehouse_source import (
        DELTA_FORMAT_NAME,
        DeltaAppendsDataSource,
    )

    spark.dataSource.register(DeltaAppendsDataSource)
    return (
        spark.readStream.format(DELTA_FORMAT_NAME)
        .option("root", root)
        .option("from_version", str(from_version))
        .option("on_remove", on_remove)
        .load()
    )


def stream_read_iceberg(
    spark,
    root: str,
    from_sequence: int = 0,
    on_non_append: str = "fail",
) -> DataFrame:
    """Streaming read of a jar-free Iceberg v2 table's append snapshots
    (`sources/iceberg.py`): offsets are sequence numbers; each
    micro-batch delivers the snapshots' newly-added data files with
    identity partition columns reconstructed from manifest metadata,
    stamped `_commit_snapshot_id`. Non-append snapshots
    (overwrite/delete) fail the stream or skip with
    `on_non_append='skip'`."""
    from deltacat_spark.streaming.lakehouse_source import (
        ICEBERG_FORMAT_NAME,
        IcebergAppendsDataSource,
    )

    spark.dataSource.register(IcebergAppendsDataSource)
    return (
        spark.readStream.format(ICEBERG_FORMAT_NAME)
        .option("root", root)
        .option("from_sequence", str(from_sequence))
        .option("on_non_append", on_non_append)
        .load()
    )


def make_stream_sink(
    catalog,
    table: str,
    namespace: str = "default",
    mode: str = "add",
    txn_app_id: str | None = None,
):
    """Build the idempotent foreachBatch sink used by
    :func:`stream_write_to_table`.

    `foreachBatch` is at-least-once per batch_id: if the table commit
    lands but the crash happens before Structured Streaming records the
    checkpoint offset, the SAME batch re-runs on restart. The sink
    therefore stamps every commit with (txn_app_id, batch_id) through
    the atomic commit-properties channel (properties land on the SAME
    commit as the data) and skips any batch_id ≤ the last recorded one
    — the Delta Lake `txnAppId`/`txnVersion` idempotence scheme. Batch
    ids are monotone per checkpoint, so one bigint per app id is the
    entire dedup state.
    """
    app = txn_app_id or f"{namespace}.{table}"
    prop_key = f"stream.batch.{app}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not catalog.table_exists(table, namespace):
            from deltacat_spark.schema import Schema

            catalog.create_table(
                table,
                namespace,
                schema=Schema.from_dataframe(batch_df),
                fail_if_exists=False,
            )
        else:
            last = catalog.snapshot(table, namespace).properties.get(prop_key)
            if last is not None and batch_id <= int(last):
                return  # replayed batch — already committed atomically
        catalog.write_to_table(
            batch_df,
            table,
            namespace,
            mode=mode,
            commit_properties={prop_key: str(batch_id)},
        )

    return _sink


def stream_write_to_table(
    stream_df: DataFrame,
    catalog,
    table: str,
    namespace: str = "default",
    mode: str = "add",
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
    txn_app_id: str | None = None,
):
    """Write a streaming DataFrame into a catalog table.

    Each micro-batch becomes one atomic commit (`mode` add|append|chrono
    — chrono stamps the commit with the batch's max event time, giving
    the reference's CHRONO/watermark semantics on a live stream), made
    EXACTLY-ONCE under foreachBatch replays via the (txn_app_id,
    batch_id) stamp — see :func:`make_stream_sink`. Returns the
    StreamingQuery.
    """
    sink = make_stream_sink(catalog, table, namespace, mode, txn_app_id)
    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# lakehouse-format streaming sinks (Delta / Hudi)
# ---------------------------------------------------------------------------


def make_delta_stream_sink(
    root: str,
    partition_by: "list[str] | None" = None,
    app_id: "str | None" = None,
):
    """Idempotent foreachBatch sink into a jar-free Delta table.

    Exactly-once via the spec's SetTransaction handshake: every batch
    commit carries `txn=(app_id, batch_id)` IN the commit, and a
    replayed batch (crash between the table commit and Spark's offset
    checkpoint) is recognized by `latest_txn_version` and skipped.
    Batch ids are monotone per checkpoint, so distinct streams into one
    table need distinct `app_id`s."""
    import os as _os

    app = app_id or f"delta-sink:{_os.path.basename(root.rstrip('/'))}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from deltacat_spark.sources.deltalake import (
            latest_txn_version,
            write_delta,
        )

        if batch_df.isEmpty():
            return
        last = latest_txn_version(root, app)
        if last is not None and batch_id <= last:
            return  # replayed batch — already committed atomically
        write_delta(
            batch_df,
            root,
            mode="append",
            partition_by=partition_by,
            txn=(app, batch_id),
        )

    return _sink


def stream_write_delta(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: "str | None" = None,
    partition_by: "list[str] | None" = None,
    app_id: "str | None" = None,
    trigger_once: bool = True,
):
    """Streaming DataFrame → Delta table, one append commit per
    micro-batch, exactly-once under replays (see
    :func:`make_delta_stream_sink`). Returns the StreamingQuery."""
    sink = make_delta_stream_sink(root, partition_by, app_id)
    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_hudi_stream_sink(
    root: str,
    record_key_field: str,
    partition_by: "list[str] | None" = None,
    app_id: "str | None" = None,
    operation: str = "upsert",
):
    """Idempotent foreachBatch sink into a jar-free Hudi CoW table —
    streaming UPSERT by record key (the Hudi ingest shape: late
    re-deliveries of a key become in-place slice rewrites, not dupes).

    Exactly-once via the commit's `extraMetadata` checkpoint carrier:
    each batch commit stamps `deltacat.streaming.<app>` = batch_id in
    the SAME instant, and a replayed batch is recognized by
    `latest_extra_meta` and skipped."""
    import os as _os

    app = app_id or f"hudi-sink:{_os.path.basename(root.rstrip('/'))}"
    meta_key = f"deltacat.streaming.{app}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from deltacat_spark.sources.hudi import (
            latest_extra_meta,
            write_hudi,
        )

        if batch_df.isEmpty():
            return
        last = latest_extra_meta(root, meta_key)
        if last is not None and batch_id <= int(last):
            return  # replayed batch — already committed atomically
        write_hudi(
            batch_df,
            root,
            record_key_field=record_key_field,
            operation=operation,
            partition_by=partition_by,
            extra_meta={meta_key: str(batch_id)},
        )

    return _sink


def stream_write_hudi(
    stream_df: DataFrame,
    root: str,
    record_key_field: str,
    checkpoint_dir: "str | None" = None,
    partition_by: "list[str] | None" = None,
    app_id: "str | None" = None,
    operation: str = "upsert",
    trigger_once: bool = True,
):
    """Streaming DataFrame → Hudi CoW table, one upsert instant per
    micro-batch, exactly-once under replays (see
    :func:`make_hudi_stream_sink`). Returns the StreamingQuery."""
    sink = make_hudi_stream_sink(
        root, record_key_field, partition_by, app_id, operation
    )
    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_iceberg_stream_sink(
    root: str,
    partition_by: "list[str] | None" = None,
    app_id: "str | None" = None,
):
    """Idempotent foreachBatch sink into a jar-free Iceberg v2 table:
    one append snapshot per micro-batch, the batch id stamped into the
    snapshot SUMMARY (the spec's engine-property carrier), replays
    recognized by `latest_summary_value` and skipped.

    Retention interplay: the stamp lives on snapshots, so
    `expire_snapshots` must retain at least the stream's newest stamped
    snapshot (it does — the current snapshot always survives; only
    aggressive expiry interleaved with OTHER writers between a sink
    commit and its offset checkpoint could drop the stamp)."""
    import os as _os

    app = app_id or f"iceberg-sink:{_os.path.basename(root.rstrip('/'))}"
    key = f"deltacat.streaming.{app}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from deltacat_spark.sources.iceberg import (
            latest_summary_value,
            write_iceberg,
        )

        if batch_df.isEmpty():
            return
        last = latest_summary_value(root, key)
        if last is not None and batch_id <= int(last):
            return  # replayed batch — already committed atomically
        write_iceberg(
            batch_df,
            root,
            mode="append",
            partition_by=partition_by,
            summary_extra={key: str(batch_id)},
        )

    return _sink


def stream_write_iceberg(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: "str | None" = None,
    partition_by: "list[str] | None" = None,
    app_id: "str | None" = None,
    trigger_once: bool = True,
):
    """Streaming DataFrame → Iceberg table, one append snapshot per
    micro-batch, exactly-once under replays (see
    :func:`make_iceberg_stream_sink`). Returns the StreamingQuery."""
    sink = make_iceberg_stream_sink(root, partition_by, app_id)
    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
