"""Generate the one-off sf1 audit corpus (VERDICT r7 Next #4).

Writes /root/repo/.localdata/sf1/{documents,embeddings}.parquet — a 10×
scale-up of sf0.1 (50k docs, 20k embeddings) in the SAME distribution
family as the driver testdata:

- documents: the repo's own `fake_docs` Python DataSource (distributed
  partitioned generation, splitmix64-deterministic). The real
  documents.parquet uses the same ~31-word vocabulary and 5-100 word
  length law, so dedup/text entries behave representatively.
- embeddings: near-uniform random UNIT vectors (float32[64]) with a
  ~balanced 10-label multinomial — exactly the regime of the driver's
  embeddings.parquet (measured: unit norms, labels ~N/10 each, 3-NN
  only ~9% same-label). Generated distributed via mapInPandas, one rng
  stream per row id (Philox keyed by vec_id) so any partitioning yields
  identical bytes.

Usage: python scripts/gen_scale_data.py [--docs 50000] [--emb 20000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

OUT = "/root/repo/.localdata/sf1"
EMB_DIM = 64
N_LABELS = 10


def gen_embeddings(spark, n: int):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            vecs, labels = [], []
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=int(i)))
                v = rng.standard_normal(EMB_DIM)
                v /= np.sqrt((v * v).sum())
                vecs.append(v.astype(np.float32))
                labels.append(int(rng.integers(0, N_LABELS)))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": vecs, "label": pd.array(labels, dtype="int32")}
            )

    return spark.range(n).mapInPandas(
        gen, "vec_id long, embedding array<float>, label int"
    )


def gen_events(spark, n: int, n_users: int):
    """10× the sf0.1 events table in the same family: 5 event types,
    uniform users, 30-day window, value ~ |N(50, 20)| on purchases.
    Philox keyed by event_id — any partitioning yields identical
    bytes."""
    types = ["click", "error", "purchase", "signup", "view"]

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            rows = {"event_id": ids, "ts": [], "user_id": [],
                    "event_type": [], "value": [], "props": []}
            base = pd.Timestamp("2024-01-01")
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=int(i) + 7))
                rows["ts"].append(
                    base + pd.Timedelta(microseconds=int(
                        rng.integers(0, 30 * 86400_000_000)
                    ))
                )
                rows["user_id"].append(int(rng.integers(0, n_users)))
                et = types[int(rng.integers(0, len(types)))]
                rows["event_type"].append(et)
                rows["value"].append(
                    round(abs(float(rng.normal(50.0, 20.0))), 2)
                    if et == "purchase" else 0.0
                )
                rows["props"].append("{}")
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def gen_orders(spark, n: int, n_cust: int):
    """10× the sf0.1 orders table: uniform 1992-1998-style price range
    collapsed to a uniform [1k, 500k) cents law over one year of
    dates."""
    stats = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            rows = {"o_orderkey": ids, "o_custkey": [], "o_orderstatus": [],
                    "o_totalprice": [], "o_orderdate": [],
                    "o_orderpriority": []}
            base = pd.Timestamp("2024-01-01")
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=int(i) + 13))
                rows["o_custkey"].append(int(rng.integers(1, n_cust + 1)))
                rows["o_orderstatus"].append(
                    stats[int(rng.integers(0, len(stats)))]
                )
                rows["o_totalprice"].append(
                    int(rng.integers(100_000, 50_000_000)) / 100.0
                )
                rows["o_orderdate"].append(
                    base + pd.Timedelta(days=int(rng.integers(0, 365)))
                )
                rows["o_orderpriority"].append(
                    prios[int(rng.integers(0, len(prios)))]
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )


def gen_lineitem(spark, n: int, n_orders: int, n_parts: int):
    """Lineitem rows in the sf0.1 family (4 lines/order average):
    orderkey = id // 4 (so basket width stays ~TPC-H-shaped at any
    scale), partkey mildly skewed (square law) so basket_lift has
    hot parts, quantities/prices in the TPC-H ranges. Philox keyed
    by line id — partition-independent bytes."""
    flags = ["A", "N", "R"]

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            rows = {
                "l_orderkey": [], "l_partkey": [], "l_suppkey": [],
                "l_linenumber": [], "l_quantity": [],
                "l_extendedprice": [], "l_discount": [], "l_tax": [],
                "l_returnflag": [], "l_linestatus": [], "l_shipdate": [],
            }
            base = pd.Timestamp("2024-01-01")
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=int(i) + 29))
                rows["l_orderkey"].append(int(i) // 4)
                rows["l_partkey"].append(
                    int(n_parts * float(rng.random()) ** 2) + 1
                )
                rows["l_suppkey"].append(int(rng.integers(1, 1001)))
                rows["l_linenumber"].append(int(i) % 4 + 1)
                q = int(rng.integers(1, 51))
                rows["l_quantity"].append(float(q))
                rows["l_extendedprice"].append(
                    int(rng.integers(90_000, 10_500_000)) / 100.0
                )
                rows["l_discount"].append(int(rng.integers(0, 11)) / 100.0)
                rows["l_tax"].append(int(rng.integers(0, 9)) / 100.0)
                rows["l_returnflag"].append(
                    flags[int(rng.integers(0, len(flags)))]
                )
                rows["l_linestatus"].append(
                    "O" if int(rng.integers(0, 2)) else "F"
                )
                rows["l_shipdate"].append(
                    base + pd.Timedelta(days=int(rng.integers(0, 365)))
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )


def gen_customer(spark, n: int):
    """Customer dimension in the sf0.1 family (keys cover every
    o_custkey the orders generator draws)."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64) + 1
            rows = {"c_custkey": ids, "c_name": [], "c_nationkey": [],
                    "c_acctbal": [], "c_mktsegment": []}
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=int(i) + 37))
                rows["c_name"].append(f"Customer#{int(i):09d}")
                rows["c_nationkey"].append(int(rng.integers(0, 25)))
                rows["c_acctbal"].append(
                    int(rng.integers(-99_999, 1_000_000)) / 100.0
                )
                rows["c_mktsegment"].append(
                    segs[int(rng.integers(0, len(segs)))]
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )


def gen_supplier(spark, n: int):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64) + 1
            rows = {"s_suppkey": ids, "s_name": [], "s_nationkey": [],
                    "s_acctbal": []}
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=int(i) + 41))
                rows["s_name"].append(f"Supplier#{int(i):09d}")
                rows["s_nationkey"].append(int(rng.integers(0, 25)))
                rows["s_acctbal"].append(
                    int(rng.integers(-99_999, 1_000_000)) / 100.0
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )


def gen_part(spark, n: int):
    types = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    mats = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64) + 1
            rows = {"p_partkey": ids, "p_name": [], "p_brand": [],
                    "p_type": [], "p_size": [], "p_retailprice": []}
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=int(i) + 43))
                rows["p_name"].append(f"part {int(i)}")
                rows["p_brand"].append(
                    f"Brand#{int(rng.integers(1, 6))}{int(rng.integers(1, 6))}"
                )
                rows["p_type"].append(
                    f"{types[int(rng.integers(0, len(types)))]} "
                    f"{mats[int(rng.integers(0, len(mats)))]}"
                )
                rows["p_size"].append(int(rng.integers(1, 51)))
                rows["p_retailprice"].append(
                    int(rng.integers(90_000, 200_000)) / 100.0
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--emb", type=int, default=20_000)
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=75_000)
    ap.add_argument("--orders", type=int, default=1_500_000)
    ap.add_argument("--lines", type=int, default=6_000_000)
    ap.add_argument("--parts", type=int, default=20_000)
    args = ap.parse_args()

    from homemade_vector_db_spark.session import get_spark
    from homemade_vector_db_spark.sources import generator

    spark = get_spark(
        app_name="gen-scale-data",
        cpus=16,
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    generator.register(spark)
    os.makedirs(OUT, exist_ok=True)

    docs = (
        spark.read.format("fake_docs")
        .option("n", args.docs)
        .option("numPartitions", 16)
        .load()
    )
    # Round 12: reproduce the driver testdata's DUPLICATE structure —
    # 5% of docs carry text = (another doc's text) || ' dup' (the
    # neardup_eval truth law; sf0.01 measures 25/500 such docs and the
    # 'dup' token is the one sub-max_df rare term). Without it the sf1
    # dedup-family audit rows are vacuous: tfidf_cosine_neardup returned
    # 0 rows because every generated term sits in >50% of docs.
    # Deterministic: doc_id % 20 == 7 becomes a dup of doc_id - 1
    # (partner % 20 == 6 can never itself be a dup — no chains).
    from pyspark.sql import functions as F

    base = docs.where((F.col("doc_id") % 20 != 7) | (F.col("doc_id") == 0))
    partners = docs.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" dup")).alias("text"),
    )
    dups = (
        docs.where((F.col("doc_id") % 20 == 7) & (F.col("doc_id") > 0))
        .drop("text")
        .join(partners, "doc_id")
        .withColumn("n_chars", F.length("text"))
        .select(*docs.columns)
    )
    docs = base.unionByName(dups)
    docs.repartition(8).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    print(f"documents: {args.docs} rows -> {OUT}/documents.parquet")

    emb = gen_embeddings(spark, args.emb)
    emb.repartition(8).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    print(f"embeddings: {args.emb} rows -> {OUT}/embeddings.parquet")

    ev = gen_events(spark, args.events, args.users)
    ev.repartition(8).write.mode("overwrite").parquet(f"{OUT}/events.parquet")
    print(f"events: {args.events} rows -> {OUT}/events.parquet")

    orders = gen_orders(spark, args.orders, args.users)
    orders.repartition(8).write.mode("overwrite").parquet(
        f"{OUT}/orders.parquet"
    )
    print(f"orders: {args.orders} rows -> {OUT}/orders.parquet")

    li = gen_lineitem(spark, args.lines, args.orders, args.parts)
    li.repartition(16).write.mode("overwrite").parquet(
        f"{OUT}/lineitem.parquet"
    )
    print(f"lineitem: {args.lines} rows -> {OUT}/lineitem.parquet")

    # round 11: the TPC-H dimension tables, so every HEADLINE entry can
    # be audited at sf1 (VERDICT r10 Next #6). Keys cover exactly the
    # fact generators' draws (o_custkey <= users, l_suppkey <= 1000,
    # l_partkey <= parts); nation/region are the fixed TPC-H constants,
    # copied verbatim from the driver testdata.
    gen_customer(spark, args.users).repartition(2).write.mode(
        "overwrite"
    ).parquet(f"{OUT}/customer.parquet")
    print(f"customer: {args.users} rows")
    gen_supplier(spark, 1000).coalesce(1).write.mode("overwrite").parquet(
        f"{OUT}/supplier.parquet"
    )
    gen_part(spark, args.parts).repartition(2).write.mode(
        "overwrite"
    ).parquet(f"{OUT}/part.parquet")
    print(f"supplier: 1000 rows; part: {args.parts} rows")
    for dim in ("nation", "region"):
        spark.read.parquet(f"/root/testdata/sf0.1/{dim}.parquet").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{OUT}/{dim}.parquet")
    print("nation/region: copied from sf0.1 (fixed dimension constants)")
    spark.stop()


if __name__ == "__main__":
    main()
