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


class IncrementalAttribution:
    """Streaming last-touch revenue attribution — the streaming twin of
    queries.q_attribution_last_touch. State per user = the single most
    recent click/view touch (by the (ts, event_id) event order), a
    2-scalar row per active user; per micro-batch each purchase is
    credited to the later of the in-batch preceding touch and the state
    touch, under the same 7-day lookback, and per-batch channel totals
    append to a stats table.

    CHUNK LAW: when micro-batches partition the stream at time
    boundaries (every event in batch b+1 after every event in batch b —
    the shape a time-ordered source delivers), summed stats equal the
    batch entry exactly, because attribution only ever looks backward
    and the state row carries precisely the backward view across the
    cut. Round 10 (ADVICE r9 #3): the effective touch is the
    (ts, event_id)-MAX of the in-batch preceding touch and the state
    touch — not a coalesce that blindly prefers the in-batch one — so
    a batch containing events older than the state's latest touch no
    longer silently mis-attributes; the chunk law is now enforced by
    construction rather than assumed. Writes are per-batch idempotent
    (batch=<id> dirs, replay excludes own prior attempt), the
    IncrementalCorpus contract."""

    ATTR_WINDOW_US = 7 * 86400 * 1_000_000

    def __init__(self, spark, root: str):
        import os

        self.spark = spark
        self.root = root
        self.state_path = os.path.join(root, "last_touch")
        self.stats_path = os.path.join(root, "batch_stats")

    def _state(self, exclude_batch: int) -> DataFrame | None:
        try:
            s = (
                self.spark.read.parquet(self.state_path)
                .where(F.col("batch").cast("string") != str(exclude_batch))
                .drop("batch")
            )
            # several batch dirs may carry a row for the same user —
            # the latest (ts, event_id) wins
            return (
                s.groupBy("user_id")
                .agg(
                    F.max(
                        F.struct("touch_ts", "touch_event_id", "touch_type")
                    ).alias("m")
                )
                .select(
                    "user_id",
                    F.col("m.touch_ts").alias("st_ts"),
                    F.col("m.touch_event_id").alias("st_eid"),
                    F.col("m.touch_type").alias("st_type"),
                )
            )
        except Exception:
            return None

    def ingest_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        import os

        from pyspark.sql import Window

        if batch_id is None:
            batch_id = 0
        is_touch = F.col("event_type").isin("click", "view")
        ev = batch.select(
            "user_id", "ts", "event_id", "event_type", "value",
            F.when(is_touch, F.col("event_type")).alias("touch_type"),
            F.when(is_touch, F.col("ts")).alias("touch_ts"),
            F.when(is_touch, F.col("event_id")).alias("touch_eid"),
        ).persist()
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        local = (
            ev.withColumn(
                "l_type", F.last("touch_type", ignorenulls=True).over(w)
            )
            .withColumn("l_ts", F.last("touch_ts", ignorenulls=True).over(w))
            .withColumn(
                "l_eid", F.last("touch_eid", ignorenulls=True).over(w)
            )
            .where(F.col("event_type") == "purchase")
        )
        st = self._state(exclude_batch=batch_id)
        if st is not None:
            local = local.join(st, "user_id", "left")
        else:
            local = (
                local.withColumn("st_ts", F.lit(None).cast("timestamp"))
                .withColumn("st_eid", F.lit(None).cast("long"))
                .withColumn("st_type", F.lit(None).cast("string"))
            )
        # effective touch = the (ts, event_id)-LATER of the in-batch
        # preceding touch and the state touch (ADVICE r9 #3: a coalesce
        # that always preferred the in-batch touch mis-attributed when
        # a batch carried events older than the state's latest touch —
        # the max enforces the chunk law instead of assuming it).
        # ADVICE r10 #1: the state touch is ELIGIBLE only if it
        # precedes the purchase in (ts, event_id) order — the batch law
        # only ever looks backward, so a late-arriving purchase that is
        # OLDER than the state's latest touch must not be attributed to
        # that future touch (the in-batch window already guarantees
        # this for the local candidate by construction).
        # cast both sides to TIMESTAMP: the in-batch column may arrive
        # as TIMESTAMP_NTZ while parquet state reads back as TIMESTAMP,
        # and struct comparison requires equal types
        st_eligible = F.col("st_ts").isNotNull() & (
            F.struct(F.col("st_ts").cast("timestamp"), F.col("st_eid"))
            < F.struct(F.col("ts").cast("timestamp"), F.col("event_id"))
        )
        use_local = F.col("l_ts").isNotNull() & (
            ~st_eligible
            | (
                F.struct(F.col("l_ts").cast("timestamp"), F.col("l_eid"))
                > F.struct(F.col("st_ts").cast("timestamp"), F.col("st_eid"))
            )
        )
        local = local.withColumn(
            "eff_type",
            F.when(use_local, F.col("l_type"))
            .when(st_eligible, F.col("st_type"))
            .otherwise(F.lit(None).cast("string")),
        ).withColumn(
            "eff_ts",
            F.when(use_local, F.col("l_ts").cast("timestamp"))
            .when(st_eligible, F.col("st_ts").cast("timestamp"))
            .otherwise(F.lit(None).cast("timestamp")),
        )
        attributed = local.select(
            F.when(
                F.col("eff_type").isNotNull()
                & (
                    F.expr("timestampdiff(MICROSECOND, eff_ts, ts)")
                    <= self.ATTR_WINDOW_US
                )
                # belt for the backward law: never credit a touch that
                # follows the purchase (eligibility above already
                # guarantees eff_ts <= ts)
                & (F.expr("timestampdiff(MICROSECOND, eff_ts, ts)") >= 0),
                F.col("eff_type"),
            )
            .otherwise(F.lit("direct"))
            .alias("channel"),
            F.round(F.col("value") * 1e6).cast("long").alias("v_u"),
        )
        stats = attributed.groupBy("channel").agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("v_u").alias("revenue_micro"),
        )
        stats.write.mode("overwrite").parquet(
            os.path.join(self.stats_path, f"batch={batch_id}")
        )
        # new state: per user the latest in-batch touch (state rows from
        # earlier batches stay in their own dirs; _state maxes over all)
        new_touch = (
            ev.where(F.col("touch_type").isNotNull())
            .groupBy("user_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("touch_ts"),
                        F.col("touch_eid").alias("touch_event_id"),
                        F.col("touch_type"),
                    )
                ).alias("m")
            )
            .select(
                "user_id",
                F.col("m.touch_ts").alias("touch_ts"),
                F.col("m.touch_event_id").alias("touch_event_id"),
                F.col("m.touch_type").alias("touch_type"),
            )
        )
        new_touch.write.mode("overwrite").parquet(
            os.path.join(self.state_path, f"batch={batch_id}")
        )
        ev.unpersist()

    def stats(self) -> DataFrame:
        return (
            self.spark.read.parquet(self.stats_path)
            .groupBy("channel")
            .agg(
                F.sum("n_purchases").alias("n_purchases"),
                F.sum("revenue_micro").alias("revenue_micro"),
            )
            .orderBy("channel")
        )

    def attach_stream(self, stream: DataFrame, checkpoint: str | None = None):
        import os

        return (
            stream.writeStream.foreachBatch(self.ingest_batch)
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(self.root, "_attr_checkpoint"),
            )
            .outputMode("append")
            .start()
        )
