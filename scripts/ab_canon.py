"""Interleaved A/B of dedup._canonical_sets forms across PPJoin consumers
(VERDICT r13 Next #3/#10).

- win  : shipped r13 form — shingle freq via Window.partitionBy(shingle)
         count on the one shingle exchange (skew: a hot shingle's whole
         posting list serializes one window partition; AQE cannot split
         windows)
- join : freq via groupBy (map-side partial agg) joined back on shingle —
         the AQE-splittable form (skew-join handling applies); capped
         shingles drop via the inner join on the filtered freq table

Usage: python scripts/ab_canon.py [rounds] [runs] [query,query,...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.operators import dedup
from homemade_vector_db_spark.session import (
    get_spark,
    release_transient,
    track_persist as _track_persist,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_canonical_sets_win = dedup._canonical_sets


def _canonical_sets_join(sh: DataFrame, max_shingle_freq: int | None) -> DataFrame:
    hashed = sh.select(
        "doc_id", F.transform("shingles", lambda s: F.xxhash64(s)).alias("hs")
    ).transform(_track_persist)
    ex = hashed.select("doc_id", F.explode("hs").alias("shingle"))
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
    if max_shingle_freq is not None:
        freq = freq.where(F.col("freq") <= max_shingle_freq)
    ranked = ex.join(freq, "shingle").select(
        "doc_id", F.struct(F.col("freq"), F.col("shingle")).alias("fs")
    )
    return (
        ranked.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("fs")).alias("fss"))
        .select(
            "doc_id",
            F.transform("fss", lambda x: x.shingle).alias("sset"),
            F.size("fss").alias("nsh"),
        )
        .transform(_track_persist)
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    queries = (sys.argv[3].split(",") if len(sys.argv) > 3 else
               ["ngram_jaccard_neardup", "containment_neardup",
                "dedup_threshold_sweep", "neardup_components"])
    spark = get_spark(app_name="ab-canon", cpus=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    forms = {"win": _canonical_sets_win, "join": _canonical_sets_join}
    expected: dict = {}
    mins: dict = {(q, f): [] for q in queries for f in forms}
    # prebuild shared derived state once (bench policy)
    for q in queries:
        reg[q](spark, SF_DIR).collect()
        release_transient()
    for r in range(rounds):
        for fname, fimpl in forms.items():
            dedup._canonical_sets = fimpl
            for q in queries:
                fn = reg[q]
                fn(spark, SF_DIR).collect()  # warmup
                samples = []
                for _ in range(runs):
                    t0 = time.perf_counter()
                    rows = fn(spark, SF_DIR).collect()
                    samples.append(time.perf_counter() - t0)
                release_transient()
                got = [tuple(x) for x in rows]
                if q not in expected:
                    expected[q] = got
                assert got == expected[q], f"{q}/{fname} mismatch!"
                mins[(q, fname)].append(min(samples))
                print(f"round {r} {fname:4s} {q:28s} min={min(samples):.3f}",
                      flush=True)
    print("---- per-query min over rounds ----")
    for q in queries:
        w = min(mins[(q, "win")]); j = min(mins[(q, "join")])
        print(f"{q:28s} win={w:.3f} join={j:.3f} ratio={w/j:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
