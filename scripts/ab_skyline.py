"""Interleaved A/B of skyline_orders shapes.

- cur : shipped — per pass: groupBy(part, cents) + ROWS window over the
        distinct-price groups + join back (two extra exchanges and a
        probe re-execution per pass)
- rng : per pass: ONE window, orderBy(cents DESC)
        rangeBetween(unboundedPreceding, -1) — the frame holds exactly
        the strictly-higher-price rows (integer cents, -1 range offset),
        and Spark executes unbounded-preceding frames as O(n) running
        aggregation (the O(n²) rescan trap is the *unbounded-FOLLOWING*
        frame the r10 note measured at 27.8 s sf1).

Usage: python scripts/ab_skyline.py [rounds] [runs] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.queries import load_table
from homemade_vector_db_spark.session import get_spark, release_transient

SF_DIR = (sys.argv[3] if len(sys.argv) > 3
          else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def shape_rng(spark, sf_dir) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.expr(
            "timestampdiff(MICROSECOND, timestamp'1970-01-01 00:00:00',"
            " o_orderdate)"
        ).alias("dt_us"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
    )

    def survivors(df: DataFrame, part_cols: list) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.desc("cents"))
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        return (
            df.withColumn("mx", F.max("dt_us").over(w))
            .where(F.col("mx").isNull() | (F.col("dt_us") >= F.col("mx")))
            .drop("mx")
        )

    cand = survivors(o, ["mon"])
    sky = survivors(cand.select("o_orderkey", "cents", "dt_us"), [])
    return (
        sky.select("o_orderkey", "cents", "dt_us")
        .orderBy(F.desc("cents"), F.asc("o_orderkey"))
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab-skyline", cpus=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    shapes = {"cur": lambda s, d: reg["skyline_orders"](s, d),
              "rng": shape_rng}
    expected = None
    mins = {k: [] for k in shapes}
    for r in range(rounds):
        for name, fn in shapes.items():
            fn(spark, SF_DIR).collect()
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                samples.append(time.perf_counter() - t0)
            release_transient()
            got = [tuple(x) for x in rows]
            if expected is None:
                expected = got
            assert got == expected, f"{name} mismatch!"
            mins[name].append(min(samples))
            print(f"round {r} {name:4s} min={min(samples):.3f} "
                  f"med={sorted(samples)[len(samples)//2]:.3f}", flush=True)
    print("---- overall ----")
    for name, ms in mins.items():
        print(f"{name:4s} best={min(ms):.3f} worst={max(ms):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
