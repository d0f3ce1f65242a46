"""Incremental SCD2 (type-2 dimension) maintenance from a micro-batched
event stream.

Log-structured design — parquet has no row updates, so the dimension is
never rewritten in place. Each micro-batch appends its batch-locally
collapsed STATE-CHANGE rows to ``changes/batch=<id>`` (overwrite per
batch dir, so at-least-once replays are idempotent — same discipline as
streaming/ingest.py). The queryable dimension is derived at read time by
re-collapsing the (much smaller) change log with the same window pass the
batch operator uses (queries.py:q_user_state_scd2): re-collapse drops a
batch's leading row when it does not change state across the batch
boundary, so chunking is invisible in the result.

Correctness assumption (standard for CDC-style ingestion): per-user event
time is monotone ACROSS batches. Within a batch any order is fine (the
collapse sorts), but a late event arriving in a later batch can land
between two already-collapsed rows, where the dropped same-state repeats
are no longer available to re-split the interval. Late/out-of-order data
should be repaired with the batch operator over the raw log.

At scale: the change log is bounded by state transitions, not events —
typically orders of magnitude smaller than the raw log — and the derive
step is one user_id shuffle over it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _collapse(events: DataFrame) -> DataFrame:
    """Keep only rows that change state, per user, in (ts, event_id)
    order: (user_id, state, ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
        .withColumn("prev", F.lag("state").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
        .drop("prev")
    )


class IncrementalSCD2:
    """Maintains a type-2 dimension from an event stream, one micro-batch
    at a time. `ingest_batch` is the foreachBatch hook; `dimension`
    derives the current versioned view."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.changes_path = os.path.join(root, "changes")

    def ingest_batch(self, batch: DataFrame, batch_id: int) -> None:
        _collapse(batch).write.mode("overwrite").parquet(
            os.path.join(self.changes_path, f"batch={batch_id}")
        )

    def attach(self, events_stream: DataFrame, checkpoint: str):
        """writeStream wiring: collapse + idempotent per-batch append."""
        return (
            events_stream.writeStream.foreachBatch(
                lambda df, bid: self.ingest_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def dimension(self, spark: SparkSession) -> DataFrame:
        """The SCD2 view over everything ingested so far — identical
        schema and content to the batch operator on the full log."""
        changes = spark.read.parquet(self.changes_path)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        recollapsed = (
            changes.withColumn("prev", F.lag("state").over(w))
            .where(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
            .drop("prev")
        )
        return recollapsed.select(
            "user_id",
            "state",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).alias("version"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        ).orderBy("user_id", "version")
