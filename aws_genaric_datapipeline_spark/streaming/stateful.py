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


# ------------------------------------------------------- transformWithState
# Spark 4's StatefulProcessor API: typed named state cells (value/list/map)
# with TTL and timers, replacing applyInPandasWithState's single state tuple.
# Kept alongside the legacy operator above — both run on the same
# checkpointed RocksDB-backed store.
from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

HIGH_WATER_SCHEMA = "user_id long, high_water double, batch_rows long"


class HighWaterProcessor(StatefulProcessor):
    """Per-user high-water-mark detector: emits a row only when a micro-batch
    raises the user's all-time max value (monitoring/alerting shape).
    State = one double per user — constant size regardless of history."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._hw = handle.getValueState("hw", "high_water double")

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        batch_max, batch_rows = None, 0
        for pdf in rows:
            batch_rows += len(pdf)
            m = pdf["value"].max()
            if batch_max is None or m > batch_max:
                batch_max = float(m)
        current = self._hw.get()[0] if self._hw.exists() else None
        if batch_max is not None and (current is None or batch_max > current):
            self._hw.update((batch_max,))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "high_water": [batch_max],
                    "batch_rows": [batch_rows],
                }
            )

    def close(self) -> None:
        pass


def high_water_marks(events: DataFrame) -> DataFrame:
    """New per-user all-time-max emissions per micro-batch (update mode).

    Runtime note: transformWithStateInPandas starts a protobuf-channel
    Python driver worker — requires the ``protobuf`` package at runtime
    (standard on clusters; the local test skips when it's absent).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        HighWaterProcessor(),
        outputStructType=HIGH_WATER_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
