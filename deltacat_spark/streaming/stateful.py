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
