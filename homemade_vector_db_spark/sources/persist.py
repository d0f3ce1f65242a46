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

from pyspark.sql import DataFrame, SparkSession


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
