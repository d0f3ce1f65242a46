"""Stream-stream joins — correlating two live event streams.

Absent from the batch-only reference (/root/reference/README.md:148); part
of this engine's streaming surface alongside ingest/dedup/sessions.

Spark's stream-stream inner join buffers BOTH sides in the state store;
unbounded buffering is the failure mode at scale. The two levers that
bound state (and this module always sets both):

- watermarks on both inputs — rows older than the watermark are evicted;
- a time-range join condition — each side's row can only match the other
  within a bounded interval, so eviction is provably safe (Spark derives
  the state retention from the range).

State size ≈ input-rate × (watermark + range) per side, independent of
stream lifetime. The join itself shuffles both sides on the equi-key
(user_id), exactly like the batch as-of join's single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_to_purchases_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join: each purchase paired with the same user's clicks in the
    preceding `within` interval (the streaming twin of the batch
    clicks_after_errors range-join shape).

    Both inputs need (user_id, event_id, ts). Output: one row per
    qualifying (click, purchase) pair.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}")),
    ).select("p_user", "purchase_id", "purchase_ts", "click_id", "click_ts")
