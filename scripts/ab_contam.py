"""Interleaved A/B of contamination_sweep shapes under the bench protocol
(VERDICT r13 Next #1). Shapes:

- cur : the shipped r13 shape (persisted tokens, lazy per-width explodes,
        3 consumers re-explode the cached arrays)
- r12 : the pre-round shape (per-width persisted exploded relations)
- eu  : persist the UNIONED narrow per-width distinct (doc_id, source, n,
        shingle) relation the 3 consumers share (verdict suggestion);
        tokens also persisted so materialization tokenizes once
- eu1 : same, but WITHOUT the token persist (4 tokenize passes at
        materialization, zero extra cache)

Each round: for each shape, 1 warmup + K timed runs (min), release_transient
between shapes. Results asserted identical to the registry output each round.
Usage: python scripts/ab_contam.py [rounds] [runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.functions.text import tokenize
from homemade_vector_db_spark.operators import dedup
from homemade_vector_db_spark.queries import (
    CONTAM_SWEEP_NS,
    DECONTAM_BENCH_SOURCE,
    load_documents,
)
from homemade_vector_db_spark.session import (
    get_spark,
    release_transient,
    track_persist as _track_persist,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def shape_r12(spark: SparkSession, sf_dir: str) -> DataFrame:
    d0 = load_documents(spark, sf_dir)
    parts = []
    for n in CONTAM_SWEEP_NS:
        d = d0.select("doc_id", "source", dedup.shingles("text", n).alias("sh"))
        e = _track_persist(
            d.where(F.size("sh") > 0)
            .select("doc_id", "source", F.explode("sh").alias("s"))
            .select("doc_id", "source", F.xxhash64("s").alias("shingle"))
        )
        bench = (
            e.where(F.col("source") == DECONTAM_BENCH_SOURCE)
            .select("shingle")
            .distinct()
        )
        train = e.where(F.col("source") != DECONTAM_BENCH_SOURCE)
        tot = train.agg(F.countDistinct("doc_id").alias("n_train_docs"))
        flagged = train.join(bench, "shingle", "left_semi").agg(
            F.countDistinct("doc_id").alias("n_flagged")
        )
        parts.append(
            flagged.crossJoin(tot).select(
                F.lit(n).cast("long").alias("ngram_n"),
                F.col("n_train_docs").cast("long").alias("n_train_docs"),
                F.col("n_flagged").cast("long").alias("n_flagged"),
                F.round(
                    F.col("n_flagged") / F.col("n_train_docs").cast("double"), 6
                ).alias("flag_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("ngram_n")


def _union_explode(spark, sf_dir, persist_tokens: bool) -> DataFrame:
    toks = load_documents(spark, sf_dir).select(
        "doc_id", "source", tokenize("text").alias("toks")
    )
    if persist_tokens:
        toks = _track_persist(toks)

    def _width(n: int) -> DataFrame:
        return toks.select(
            "doc_id",
            "source",
            F.lit(n).alias("n"),
            F.explode(
                F.array_distinct(
                    F.transform(
                        dedup.windows_from_tokens(F.col("toks"), n),
                        lambda s: F.xxhash64(s),
                    )
                )
            ).alias("shingle"),
        )

    parts = [_width(n) for n in CONTAM_SWEEP_NS]
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    return _track_persist(e)


def _consume(spark, e: DataFrame) -> DataFrame:
    bench = (
        e.where(F.col("source") == DECONTAM_BENCH_SOURCE)
        .select("n", "shingle")
        .distinct()
    )
    train = e.where(F.col("source") != DECONTAM_BENCH_SOURCE)
    tot = train.groupBy("n").agg(F.countDistinct("doc_id").alias("n_train_docs"))
    flagged = train.join(bench, ["n", "shingle"], "left_semi").groupBy("n").agg(
        F.countDistinct("doc_id").alias("n_flagged")
    )
    ns = spark.createDataFrame([(n,) for n in CONTAM_SWEEP_NS], "ngram_n long")
    return (
        ns.join(tot.withColumnRenamed("n", "ngram_n"), "ngram_n", "left")
        .join(flagged.withColumnRenamed("n", "ngram_n"), "ngram_n", "left")
        .select(
            "ngram_n",
            F.coalesce("n_train_docs", F.lit(0)).cast("long").alias("n_train_docs"),
            F.coalesce("n_flagged", F.lit(0)).cast("long").alias("n_flagged"),
            F.round(
                F.coalesce("n_flagged", F.lit(0))
                / F.col("n_train_docs").cast("double"),
                6,
            ).alias("flag_rate"),
        )
        .orderBy("ngram_n")
    )


def shape_r12t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12's per-width persisted explodes + consumers, but every width
    derives from ONE persisted token relation (one corpus tokenize)."""
    toks = _track_persist(
        load_documents(spark, sf_dir).select(
            "doc_id", "source", tokenize("text").alias("toks")
        )
    )
    parts = []
    for n in CONTAM_SWEEP_NS:
        e = _track_persist(
            toks.select(
                "doc_id",
                "source",
                F.explode(
                    F.array_distinct(
                        F.transform(
                            dedup.windows_from_tokens(F.col("toks"), n),
                            lambda s: F.xxhash64(s),
                        )
                    )
                ).alias("shingle"),
            )
        )
        bench = (
            e.where(F.col("source") == DECONTAM_BENCH_SOURCE)
            .select("shingle")
            .distinct()
        )
        train = e.where(F.col("source") != DECONTAM_BENCH_SOURCE)
        tot = train.agg(F.countDistinct("doc_id").alias("n_train_docs"))
        flagged = train.join(bench, "shingle", "left_semi").agg(
            F.countDistinct("doc_id").alias("n_flagged")
        )
        parts.append(
            flagged.crossJoin(tot).select(
                F.lit(n).cast("long").alias("ngram_n"),
                F.col("n_train_docs").cast("long").alias("n_train_docs"),
                F.col("n_flagged").cast("long").alias("n_flagged"),
                F.round(
                    F.col("n_flagged") / F.col("n_train_docs").cast("double"), 6
                ).alias("flag_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("ngram_n")


def shape_eu(spark, sf_dir):
    return _consume(spark, _union_explode(spark, sf_dir, persist_tokens=True))


def shape_eu1(spark, sf_dir):
    return _consume(spark, _union_explode(spark, sf_dir, persist_tokens=False))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab-contam", cpus=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    shapes = {
        "cur": lambda s, d: reg["contamination_sweep"](s, d),
        "r12": shape_r12,
        "r12t": shape_r12t,
        "eu": shape_eu,
        "eu1": shape_eu1,
    }
    if names:
        shapes = {k: shapes[k] for k in names}
    expected = None
    mins: dict[str, list[float]] = {k: [] for k in shapes}
    for r in range(rounds):
        for name, fn in shapes.items():
            fn(spark, SF_DIR).collect()  # warmup (materializes persists)
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                samples.append(time.perf_counter() - t0)
            release_transient()
            # cold run: per-invocation cost with no transient cache
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            cold = time.perf_counter() - t0
            release_transient()
            got = [tuple(x) for x in rows]
            if expected is None:
                expected = got
            assert got == expected, f"{name} result mismatch!"
            mins[name].append(min(samples))
            print(f"round {r} {name:4s} min={min(samples):.3f} "
                  f"med={sorted(samples)[len(samples)//2]:.3f} cold={cold:.3f}",
                  flush=True)
    print("---- overall min-of-round-mins ----")
    for name, ms in mins.items():
        print(f"{name:4s} best={min(ms):.3f} worst={max(ms):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
