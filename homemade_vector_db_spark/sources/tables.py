"""Parquet table loaders for the synthetic star schema at /root/testdata/sf*.

Scans stay declarative (``spark.read.parquet``) so Catalyst gets filter
pushdown, column pruning and partition pruning for free — the scan-side
analogue of the reference's load path (/root/reference/local_db.py:224-265),
minus the pickle.

At 100 TB the same loaders work unchanged: parquet footers provide min/max
pruning; `spark.sql.files.maxPartitionBytes` (default 128 MB) gives
~800k input splits at 100 TB, which a 1000-executor cluster drains evenly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as BIGINT under nanosAsLong; convert
    # to timestamp(µs) — same ns→µs truncation DuckDB applies on read.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_cols = {"events": ["ts"], "lineitem": ["l_shipdate"], "orders": ["o_orderdate"]}
    for c in ts_cols.get(name, []):
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT)."""
    return load_table(spark, sf_dir, "documents")


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)."""
    return load_table(spark, sf_dir, "embeddings")


def docs_with_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid-search corpus: documents ⋈ embeddings on doc_id = vec_id.

    Mirrors the reference's parallel lists `_docs`/`_metas`/`_vectors`
    (/root/reference/local_db.py:35-37) as one relation. Inner join: a doc
    participates in hybrid search only if it has an embedding.
    """
    docs = load_documents(spark, sf_dir)
    embs = load_embeddings(spark, sf_dir)
    return docs.join(embs, docs.doc_id == embs.vec_id, "inner").drop("vec_id")
