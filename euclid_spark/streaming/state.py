"""Custom stateful streaming operator (SURVEY.md §2.D4 extension).

The reference's state DB holds the latest per-account state and is
updated as each block is preprocessed (state/lpn/). The streaming analog:
`applyInPandasWithState` keeps one small state blob per user_id and folds
every micro-batch into it — O(accounts) state on the cluster, emitted as
updated rows per batch.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_value", DoubleType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_value", DoubleType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, last_id, last_val, total = (
        state.get if state.exists else (0, -1, 0.0, 0.0)
    )
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values("event_id")
        n += len(pdf)
        last_id = int(pdf["event_id"].iloc[-1])
        last_val = float(pdf["value"].iloc[-1])
        total += float(pdf["value"].sum())
    state.update((n, last_id, last_val, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_event_id": [last_id],
            "last_value": [last_val],
            "total_value": [total],
        }
    )


def user_state_stream(events: DataFrame) -> DataFrame:
    """Fold an event stream into per-user running state (the per-account
    state-DB analog): one state row per user, updated each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
