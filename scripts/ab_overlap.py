"""Interleaved A/B of source_overlap shapes (VERDICT r13 Next #4).

- cur : shipped shape — distinct (source, shingle) vocab self-joined on
        shingle (SMJ), AQE exchange-reuse shares the distinct subtree
- agg : groupBy(shingle).collect_set(source) + two explodes emit the
        same (source_a, source_b) rows with NO self-join; the hot-key
        fan-out is bounded by #sources both map-side and reduce-side

Usage: python scripts/ab_overlap.py [rounds] [runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.queries import _shingle_sets, load_documents
from homemade_vector_db_spark.session import get_spark, release_transient

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def shape_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_documents(spark, sf_dir).select("doc_id", "source")
    ss = (
        _shingle_sets(spark, sf_dir)
        .join(d, "doc_id")
        .select("source", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    sizes = ss.groupBy("source").agg(F.count(F.lit(1)).alias("na"))
    srcs = ss.groupBy("shingle").agg(F.collect_set("source").alias("srcs"))
    inter = (
        srcs.select(F.explode("srcs").alias("source_a"), "srcs")
        .select("source_a", F.explode("srcs").alias("source_b"))
        .where(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("source", "source_a"), "source_a")
        .select(
            "source_a",
            "source_b",
            F.col("inter").cast("long").alias("inter"),
            F.round(F.col("inter") / F.col("na"), 6).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


def shape_agh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg + int64 shingle keys: the distinct/groupBy shuffles 8-byte
    hashes instead of shingle strings (guide §2.3 narrower types; the
    contamination_sweep precedent — text never shuffles)."""
    d = load_documents(spark, sf_dir).select("doc_id", "source")
    ss = (
        _shingle_sets(spark, sf_dir)
        .join(d, "doc_id")
        .select(
            "source",
            F.explode(
                F.transform("shingles", lambda s: F.xxhash64(s))
            ).alias("shingle"),
        )
        .distinct()
    )
    sizes = ss.groupBy("source").agg(F.count(F.lit(1)).alias("na"))
    srcs = ss.groupBy("shingle").agg(F.collect_set("source").alias("srcs"))
    inter = (
        srcs.select(F.explode("srcs").alias("source_a"), "srcs")
        .select("source_a", F.explode("srcs").alias("source_b"))
        .where(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("source", "source_a"), "source_a")
        .select(
            "source_a",
            "source_b",
            F.col("inter").cast("long").alias("inter"),
            F.round(F.col("inter") / F.col("na"), 6).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab-overlap", cpus=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    shapes = {
        "cur": lambda s, d: reg["source_overlap"](s, d),
        "agg": shape_agg,
        "agh": shape_agh,
    }
    if len(sys.argv) > 3:
        shapes = {k: shapes[k] for k in sys.argv[3].split(",")}
    expected = None
    mins = {k: [] for k in shapes}
    for r in range(rounds):
        for name, fn in shapes.items():
            fn(spark, SF_DIR).collect()  # warmup
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                samples.append(time.perf_counter() - t0)
            release_transient()
            got = [tuple(x) for x in rows]
            if expected is None:
                expected = got
            assert got == expected, f"{name} result mismatch!"
            mins[name].append(min(samples))
            print(f"round {r} {name:4s} min={min(samples):.3f} "
                  f"med={sorted(samples)[len(samples)//2]:.3f}", flush=True)
    print("---- overall ----")
    for name, ms in mins.items():
        print(f"{name:4s} best={min(ms):.3f} worst={max(ms):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
