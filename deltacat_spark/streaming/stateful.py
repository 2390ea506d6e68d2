"""Custom stateful streaming operators via `applyInPandasWithState`.

The surface SURVEY §2.6 flags as new capability (the reference has no
stateful stream processing): arbitrary per-key state folded over Arrow
batches. Shipped operator: running per-key aggregates (count + sum) that
survive across micro-batches — the building block for streaming dedupe
and incremental watermarked rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("total_count", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE = StructType(
    [StructField("cnt", LongType()), StructField("total", DoubleType())]
)


def running_key_totals(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) maintained in managed state.

    Input: a streaming DataFrame with `key_col` (castable to string) and
    numeric `value_col`. Emits one updated row per key per micro-batch.
    """

    def fold(key, pdfs, state: GroupState):
        cnt, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        import pandas as pd

        yield pd.DataFrame(
            {"key": [str(key[0])], "total_count": [cnt], "total_value": [total]}
        )

    grouped = stream_df.select(
        stream_df[key_col].cast("string").alias(key_col), value_col
    ).groupBy(key_col)
    return grouped.applyInPandasWithState(
        fold,
        outputStructType=_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SCD_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("state", StringType()),
        StructField("from_us", LongType()),
        StructField("to_us", LongType()),
    ]
)
_SCD_STATE = StructType(
    [
        StructField("cur_state", StringType()),
        StructField("cur_from", LongType()),
    ]
)


def scd2_stream_intervals(
    stream_df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "state",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Streaming SCD2 interval-izer: per-key managed state holds the
    OPEN interval (current state + its start); every arriving change
    event closes it and opens the next. Emits exactly the CLOSED
    intervals the batch build (`workloads/scd.py:_intervals`) produces
    — per event, matching its semantics (a same-state refresh also
    closes/reopens) — so stream ≡ batch is testable row-for-row.

    Ordering contract: events must arrive in event-time order per key
    ACROSS micro-batches (within a batch this operator sorts). That is
    the watermark discipline any streaming interval-izer needs; out-of-
    order arrivals belong upstream in a watermarked sort buffer."""

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        cur_state, cur_from = (
            state.get if state.exists else (None, None)
        )
        out: list[tuple] = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            rows = pd.concat(chunks).sort_values(ts_col)
            for s, t in zip(rows[state_col], rows[ts_col]):
                t = int(t)
                if cur_state is not None:
                    out.append((int(key[0]), cur_state, cur_from, t))
                cur_state, cur_from = str(s), t
        state.update((cur_state, cur_from))
        yield pd.DataFrame(
            out, columns=["user_id", "state", "from_us", "to_us"]
        )

    grouped = stream_df.select(
        stream_df[key_col].cast("long").alias(key_col),
        stream_df[state_col].cast("string").alias(state_col),
        stream_df[ts_col].cast("long").alias(ts_col),
    ).groupBy(key_col)
    return grouped.applyInPandasWithState(
        fold,
        outputStructType=_SCD_OUTPUT,
        stateStructType=_SCD_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
