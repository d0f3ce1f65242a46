"""Interchange formats: JSON-lines and CSV sources/sinks.

The reference persists via pickle + .npy (/root/reference/local_db.py:210-265)
— opaque, single-process formats. Parquet is this engine's native storage
(sources/tables.py, persist.py); these readers/writers cover the interchange
boundary where corpora arrive as JSONL/CSV dumps.

Scale rules baked in:
- ALWAYS an explicit schema — schema inference is a full extra pass over
  the data (100 TB read twice) and can mis-type sparse columns.
- JSONL carries arrays natively; CSV cannot, so the embedding column is
  JSON-encoded on write and decoded with `from_json` on read (a codegen'd
  expression, not a UDF).
- Both formats split by line, so reads parallelize like parquet scans
  (minus column pruning/statistics — the docstring warns, the loaders are
  for ingest, after which data should be parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line; arrays/maps serialize natively."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Explicit-schema JSONL read; malformed lines land in a PERMISSIVE
    null row rather than failing the 100 TB job (Spark default)."""
    return spark.read.schema(schema).json(path)


def _array_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields if isinstance(f.dataType, T.ArrayType)]


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink; array columns are JSON-encoded strings (CSV is flat)."""
    cols = [
        F.to_json(c).alias(c) if isinstance(df.schema[c].dataType, T.ArrayType) else F.col(c)
        for c in df.columns
    ]
    df.select(*cols).write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Explicit-schema CSV read; JSON-encoded array columns are decoded
    with from_json (codegen'd, no Python boundary)."""
    arrays = _array_cols(schema)
    flat = T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name in arrays else f.dataType)
            for f in schema.fields
        ]
    )
    df = spark.read.schema(flat).option("header", True).csv(path)
    for f in schema.fields:
        if f.name in arrays:
            df = df.withColumn(f.name, F.from_json(F.col(f.name), f.dataType))
    return df.select(*[f.name for f in schema.fields])


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format (Hive/Trino
    ecosystems). Columnar with min/max statistics like parquet, so reads
    keep predicate pushdown and column pruning."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC source. Schema optional: ORC embeds its schema in the footer
    (no inference pass over the data, unlike JSONL/CSV); pass one only to
    assert/narrow the expected shape."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
