"""Sinks and table-layout helpers for scale.

The reference's sink is a pickle folder (/root/reference/local_db.py:210-222).
Here the sinks are parquet with the two layout levers that matter at 100 TB:

- write_partitioned: directory partitioning → partition PRUNING. A filter
  on the partition column skips whole directories; `.explain` shows it in
  PartitionFilters instead of PushedFilters.
- write_bucketed: hash bucketing (saveAsTable) → shuffle-FREE joins and
  aggregations on the bucket key. Two tables bucketed the same way
  co-locate matching keys, so a join between them plans as a zipped
  SortMergeJoin with NO Exchange on either side — the single biggest
  shuffle saving available for repeated large-scale joins (e.g. doc_id
  joins between documents, embeddings, postings, and scores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
) -> Column:
    """Morton (Z-order) key over 2+ numeric columns as a pure codegen
    expression: each column is min/max-scaled to a `bits`-bit integer
    (one tiny agg collected to the driver — bounds, not data), then the
    bit-planes are interleaved with shift/or arithmetic unrolled in
    Python (bits × ncols static terms, no UDF, no loop at runtime).

    Sorting/range-partitioning by this key clusters rows that are close
    in EVERY dimension into the same files, so parquet min/max pruning
    works for filters on any of the participating columns — the
    multi-dimensional generalization of a linear sort, and the layout
    trick behind Delta/Iceberg Z-ORDER compaction. Total key width is
    bits × ncols and must fit a signed 64-bit long."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use a plain sort for 1)")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds int64")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).first()
    scale = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit(scale),
            F.greatest(
                F.lit(0),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * scale),
            ),
        ).cast("long")
        for b in range(bits):
            # bit b of column ci lands at interleaved position
            # b * ncols + ci (column 0 gets the higher plane of each pair)
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: range-partition on the Morton key
    (one exchange — sampling picks balanced split points, so skew in the
    raw columns doesn't skew files) and sort within each task so row
    groups inherit the clustering too. Filters on ANY of `cols` then
    prune at three levels: file footer min/max, row-group stats, and
    page indexes — without this, a linear sort only serves its leading
    column (verified in tests/test_persist.py)."""
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    sort_cols: list[str] | None = None,
) -> None:
    """Directory-partitioned parquet; optional `sort_cols` sorts rows
    WITHIN each task's files (a narrow, shuffle-free sortWithinPartitions)
    so parquet row-group min/max statistics become selective — a point
    lookup or range filter on the sort key then skips most row groups
    inside a file, the third pruning tier after directory partitioning
    and file-level footer stats."""
    if sort_cols:
        # partition cols lead the sort: the dynamic-partition writer
        # requires task-local ordering by partition columns and would
        # otherwise re-sort (not order-preserving); with the prefix
        # already satisfied, the writer's sort is elided and the
        # sort_cols order survives into the files
        df = df.sortWithinPartitions(*partition_cols, *sort_cols)
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table. Joins/aggs on
    `bucket_col` between tables with identical bucketing skip the
    exchange entirely (verified in tests/test_persist.py)."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
