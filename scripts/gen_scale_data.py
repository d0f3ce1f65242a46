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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--emb", type=int, default=20_000)
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
    docs.repartition(8).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    print(f"documents: {args.docs} rows -> {OUT}/documents.parquet")

    emb = gen_embeddings(spark, args.emb)
    emb.repartition(8).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    print(f"embeddings: {args.emb} rows -> {OUT}/embeddings.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
