"""Streaming sessionization — the streaming twin of queries.q_sessionize.

The reference engine is batch-only (/root/reference/README.md:148); session
windows are part of the training-data-pipeline surface this engine adds.
Two tiers, trading built-in convenience against custom per-session logic:

- `session_window_agg`: Spark's native `F.session_window(ts, gap)` —
  dynamic-gap session windows with watermark-driven state eviction. The
  planner merges overlapping windows map-side before the shuffle, and the
  state store holds only open windows per key, so at 100 TB the state is
  bounded by (active users x open sessions), not by event volume.
- `sessionize_stateful`: `applyInPandasWithState` with an event-time
  timeout — the custom-stateful-operator escape hatch for logic the
  built-in can't express (e.g. emitting per-session aggregates beyond
  count, or side-effects on session close). State per key is three
  scalars (start, last, n); sessions close either by an in-batch gap or
  by the watermark passing last_ts + gap (timeout path).

Both emit only CLOSED sessions (append mode) — the streaming-correct
contract, since an open session's aggregates are not final.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: (session_start_us, last_ts_us, n_events) as epoch microseconds
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def session_window_agg(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Native session windows: one row per (key, closed session).

    Append output mode emits a session only once the watermark passes its
    close — late events within the watermark horizon re-open/merge windows
    correctly (the state store keeps open windows keyed by (key, window)).
    """
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def _sessionize_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_us, last_us, n)

        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: close it
            if state.exists:
                closed.append(tuple(state.get))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdf_iter:
                ts_us.extend(_us(t) for t in pdf["ts"])
            ts_us.sort()

            if state.exists:
                cur_start, cur_last, cur_n = state.get
            else:
                cur_start = cur_last = ts_us[0]
                cur_n = 0

            for t in ts_us:
                if cur_n > 0 and t - cur_last > gap_us:
                    closed.append((cur_start, cur_last, cur_n))
                    cur_start, cur_n = t, 0
                cur_last = max(cur_last, t)
                cur_n += 1

            state.update((cur_start, cur_last, cur_n))
            # close when the watermark passes last + gap
            state.setTimeoutTimestamp((cur_last + gap_us) // 1000)

        if not closed:
            return
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s * 1000) for s, _, _ in closed],
                "session_end": [pd.Timestamp(e * 1000) for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )

    return fn


def sessionize_stateful(
    events_stream: DataFrame,
    gap_s: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState.

    Emits one row per closed session; the open session per key lives in
    the state store (3 longs) and closes on gap or event-time timeout.
    Requires a watermark (event-time timeout semantics).
    """
    keyed = (
        events_stream.withWatermark(ts_col, watermark)
        .select(F.col(key_col).cast("long").alias("user_id"), F.col(ts_col).alias("ts"))
        .groupBy("user_id")
    )
    return keyed.applyInPandasWithState(
        _sessionize_fn(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
