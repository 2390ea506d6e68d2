"""Structured Streaming surface for the table format.

The reference's streaming story is embryonic — an `is_event_time` field,
a per-stream watermark int (`stream.py:98-103`, `table_version.py:52`),
and CHRONO out-of-order ingestion. SURVEY §2.6 maps those to Spark
Structured Streaming and flags tumbling/sliding/session windows +
stateful ops as the new surface we add.
"""

from deltacat_spark.streaming.api import (
    session_window_agg,
    sliding_window_agg,
    stream_read_changes,
    stream_read_delta,
    stream_read_hudi,
    stream_read_iceberg,
    stream_write_delta,
    stream_write_hudi,
    stream_write_iceberg,
    stream_write_to_table,
    tumbling_window_agg,
)

__all__ = [
    "session_window_agg",
    "sliding_window_agg",
    "stream_read_changes",
    "stream_read_delta",
    "stream_read_hudi",
    "stream_read_iceberg",
    "stream_write_delta",
    "stream_write_hudi",
    "stream_write_iceberg",
    "stream_write_to_table",
    "tumbling_window_agg",
]
