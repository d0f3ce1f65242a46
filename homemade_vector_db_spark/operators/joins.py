"""Join operators beyond vanilla equi-joins.

The reference has no explicit joins (SURVEY.md §2.2) — these are the
§2.2-checklist extensions a real analytics engine needs, each in its
scalable form:

- asof_join: for every left row, the latest right row with right.ts ≤
  left.ts within the same key. Implemented as the union + window trick:
  tag both sides, sort each key's events once, and carry the last seen
  right value forward with last(ignorenulls) — ONE shuffle on (key), no
  per-row range probe, no skew beyond the key distribution. This is the
  standard distributed as-of (a sort-merge within partitions), vs the
  naive range-join which explodes to |L|·|R| per key.
- range_join_bucketed: inequality joins (l.ts BETWEEN r.start AND r.end)
  bucketed by coarse time slice so the cross product is bounded per
  bucket instead of per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row with right.ts ≤ left.ts per key.

    Left rows with no prior right row keep NULLs (like an outer as-of).
    Ties (equal ts): the right row at the same timestamp is visible —
    ≤ semantics, with the right side ordered before the left at equal ts.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    lcols = left.columns
    ltag = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    rtag = right.select(
        F.col(on),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts_col)],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).select(*lcols, "__is_left", *[f"__r_{c}" for c in value_cols])

    unioned = ltag.unionByName(rtag)
    # right rows (__is_left=0) sort before left rows at equal ts → ≤ visible
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__is_left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("__is_left") == 1).drop("__is_left")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: hot keys on the big side would send one
    reducer 1000× the work of the rest; salting splits each key into
    `num_salts` shards. The big side gets a deterministic per-row salt
    (hash of all columns, so re-runs shard identically); the small side is
    replicated across all salts (explode — acceptable because the small
    side is small). Join key becomes (on, salt).

    AQE's skew-join handles sort-merge skew automatically; use this when
    AQE can't help — e.g. a skewed aggregation feeding a join, or a
    deliberately partitioned downstream write.
    """
    salt_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(num_salts)).cast("int")
    )
    salt_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salt_big.join(salt_small, [on, "__salt"], how).drop("__salt")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """left.ts ∈ [right.start, right.end] via time-bucket co-partitioning.

    Each right interval is exploded to the buckets it spans; the join key
    becomes (bucket), turning an O(|L|·|R|) theta join into a bounded
    per-bucket equi-join + residual filter — the distributed range-join
    pattern AQE can't derive on its own.
    """
    b = F.lit(bucket_seconds)
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(left_ts)) / b).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_start)) / b).cast("long"),
                (F.unix_timestamp(F.col(right_end)) / b).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, "__bucket").where(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) <= F.col(right_end))
    )
    return joined.drop("__bucket")
