"""Custom stateful streaming operator (applyInPandasWithState).

The reference has no stateful streaming (SURVEY §2.10) — this is the
north-star extension: a running per-user aggregate whose state survives
across micro-batches via the state store, the building block for
streaming sessionization / rate limiting / incremental dedup at 100 TB
(state is partitioned by key across executors; nothing driver-side).

Semantics: for each user, maintain (n_events, total_value, last_ts)
forever (no timeout) and emit the updated running totals once per
micro-batch in which the user appears.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the running state.

    Values are summed in one pandas pass per batch (Arrow-vectorized);
    state holds three scalars per user — the state store footprint is
    O(distinct users), not O(events).
    """
    (user_id,) = key
    n, total, last_ts = (state.get if state.exists else (0, 0.0, None))
    for pdf in pdfs:
        n += int(len(pdf))
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with persistent state.

    ``events`` must be a streaming DataFrame with (user_id, ts, value).
    State is partitioned by user_id across the cluster; each micro-batch
    shuffles only its own rows to their state partitions.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
