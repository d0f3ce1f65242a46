"""Streaming deduplication — drop repeated documents as they arrive.

Two tiers, both built on Structured Streaming's managed state:

- exact: `dropDuplicatesWithinWatermark` on a content hash. State is one
  hash per doc bounded by the watermark horizon — the streaming analogue
  of the batch exact_dedup groupBy, with the same 8-byte-key trick
  (xxhash64 of the dedup key, never the document body, in state).
- near-dup: hash the MinHash band buckets instead of the exact content —
  documents sharing a band bucket within the watermark window are treated
  as duplicates. Cheaper than true streaming-Jaccard (which needs a
  stateful shingle store) and catches the high-similarity tail; a batch
  verification pass (operators/dedup.minhash_lsh_pairs) refines offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep one row per key within the watermark horizon.

    Across micro-batches the earliest batch wins (later arrivals are
    dropped against state); within a single micro-batch the surviving
    representative is arbitrary — callers needing a deterministic winner
    should pre-aggregate the batch (min_by) before the sink.
    """
    hashed = stream.withColumn("__key_hash", F.xxhash64(*key_cols))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__key_hash"])
        .drop("__key_hash")
    )
