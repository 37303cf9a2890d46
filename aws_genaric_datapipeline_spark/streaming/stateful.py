"""Custom stateful streaming operators via applyInPandasWithState.

When windows/watermark aggregations can't express the state machine (running
totals that never expire, per-entity counters, custom session logic), the
escape hatch is arbitrary per-key state with Arrow-batched Python:
``applyInPandasWithState``.  State lives in the checkpointed state store —
exactly-once across restarts; state size is bounded by key cardinality, so
at 100 TB pair it with key expiry (GroupStateTimeout) for unbounded key
spaces.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_count", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("event_count", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user event counts/value sums across all micro-batches.

    Unlike a windowed aggregation, the totals never expire — the state is a
    single (count, sum) pair per user, updated per micro-batch and emitted
    as the new running value.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        count, vsum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            vsum += float(pdf["value"].sum())
        state.update((count, vsum))
        yield pd.DataFrame(
            {"user_id": [user_id], "event_count": [count], "value_sum": [round(vsum, 2)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_COUNTS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
