"""Table maintenance: small-file compaction.

The reference rewrites its whole store on every save (pickle + .npy,
/root/reference/local_db.py:210-222) so it never meets the small-files
problem. A streamed / incrementally-appended parquet table does: every
micro-batch or task writes its own file, and a 100 TB table accumulates
millions of kilobyte files whose open/footer costs dominate scans and
whose listing crushes the driver.

`compact_parquet` rewrites a parquet directory into ~target-sized files:
size the output by actual bytes (not row counts — row width varies), use
`coalesce` when shrinking the file count (narrow dependency, no shuffle)
and `repartition` only when more output files than input partitions are
needed. Write to a NEW directory and swap at the orchestration layer —
in-place rewrites of a live table are not atomic on plain filesystems.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def parquet_dir_bytes(path: str) -> int:
    """Total bytes of parquet data files under `path` (driver-side walk;
    listing cost is what compaction exists to keep bounded)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 256,
) -> int:
    """Rewrite `src` parquet into `dst` with ~target_file_mb files.

    Returns the number of output partitions written. Shuffle-free when
    reducing file count (`coalesce`); only a genuine fan-out (more output
    files than current partitions, e.g. splitting one giant file for
    parallelism) pays a round-robin `repartition`.
    """
    df: DataFrame = spark.read.parquet(src)
    n_out = max(1, -(-parquet_dir_bytes(src) // (target_file_mb * 1024 * 1024)))
    n_in = df.rdd.getNumPartitions()
    out = df.coalesce(n_out) if n_out <= n_in else df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst)
    return n_out


def compact_batched_state(
    spark: SparkSession,
    root: str,
    partition_by: str | None = None,
    target_file_mb: int = 256,
) -> int:
    """Fold a `batch=<id>`-keyed incremental-state table (streaming/
    ingest.py, streaming/dedup.py) into ONE consolidated `batch=compacted`
    dir.

    Streaming state accrues a small parquet dir per micro-batch — the
    per-batch keying buys replay idempotency, but once the checkpoint has
    advanced past those batches their granularity is pure listing
    overhead (10k micro-batches = 10k dirs the next read must stat). Run
    this OFFLINE (stream stopped): read-all → write consolidated → swap.
    The consolidated dir keeps the `batch=` layout so readers and future
    per-batch writes are unchanged; 'compacted' never collides with the
    checkpoint's numeric batch ids. Returns the number of data files
    written. Local-filesystem path handling, same assumption as the
    ad-hoc batch-id scan in ingest.py.
    """
    import shutil

    df: DataFrame = spark.read.parquet(root).drop("batch")
    tmp = root.rstrip("/") + "_compact_tmp"
    n_out = max(
        1, -(-parquet_dir_bytes(root) // (target_file_mb * 1024 * 1024))
    )
    out = df.coalesce(n_out) if n_out <= df.rdd.getNumPartitions() else df
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(tmp)

    for entry in os.listdir(root):
        if entry.startswith("batch="):
            shutil.rmtree(os.path.join(root, entry))
    os.rename(tmp, os.path.join(root, "batch=compacted"))
    return n_out
