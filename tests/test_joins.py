"""Join operators: as-of correctness vs a pure-python model, salted join
equivalence, range join bounds."""

import pytest
from pyspark.sql import functions as F

from homemade_vector_db_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
    salted_join,
)


def ts(s):
    return f"2026-01-01 {s}"


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, ts("10:00:05"), "A"), (2, ts("10:00:20"), "A"),
         (3, ts("10:00:02"), "B"), (4, ts("09:59:00"), "A")],
        "trade_id LONG, ts_s STRING, sym STRING",
    ).select("trade_id", F.to_timestamp("ts_s").alias("ts"), "sym")
    quotes = spark.createDataFrame(
        [("A", ts("10:00:00"), 10.0), ("A", ts("10:00:10"), 11.0),
         ("A", ts("10:00:20"), 12.0), ("B", ts("10:00:01"), 20.0)],
        "sym STRING, ts_s STRING, px DOUBLE",
    ).select("sym", F.to_timestamp("ts_s").alias("ts"), "px")
    return trades, quotes


def test_asof_join_semantics(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r.px_right
        for r in asof_join(trades, quotes, on="sym", value_cols=["px"]).collect()
    }
    assert out[1] == 10.0  # 10:00:05 → quote at 10:00:00
    assert out[2] == 12.0  # equal ts visible (≤ semantics)
    assert out[3] == 20.0
    assert out[4] is None  # no prior quote → NULL (outer as-of)


def test_asof_join_row_count_preserved(spark, trades_quotes):
    trades, quotes = trades_quotes
    assert asof_join(trades, quotes, on="sym", value_cols=["px"]).count() == trades.count()


def test_salted_join_equals_plain_join(spark):
    # skewed big side: one hot key with 500 rows
    big = spark.createDataFrame(
        [(i, "hot" if i % 2 == 0 else f"k{i % 7}") for i in range(1000)],
        "row_id LONG, k STRING",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k3", 3)], "k STRING, v INT"
    )
    plain = big.join(small, "k").select("row_id", "v")
    salted = salted_join(big, small, on="k", num_salts=8).select("row_id", "v")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_range_join_bucketed_bounds(spark):
    left = spark.createDataFrame(
        [(1, ts("10:00:30")), (2, ts("11:30:00")), (3, ts("12:00:00"))],
        "eid LONG, ts_s STRING",
    ).select("eid", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [(100, ts("10:00:00"), ts("10:01:00")),  # eid 1 inside
         (200, ts("11:00:00"), ts("13:00:00"))],  # eids 2,3 inside (spans buckets)
        "wid LONG, s STRING, e STRING",
    ).select(
        "wid", F.to_timestamp("s").alias("w_start"), F.to_timestamp("e").alias("w_end")
    )
    out = sorted(
        (r.eid, r.wid)
        for r in range_join_bucketed(left, right, "ts", "w_start", "w_end", 3600).collect()
    )
    assert out == [(1, 100), (2, 200), (3, 200)]
