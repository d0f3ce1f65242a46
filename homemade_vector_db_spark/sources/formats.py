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

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from homemade_vector_db_spark.session import track_persist as _track_persist

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


CORRUPT_COL = "_corrupt_record"


def read_jsonl_audited(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): PERMISSIVE JSONL read that captures each
    malformed line verbatim in a corrupt-record column instead of
    silently nulling it. At 100 TB a feed with 0.01% broken lines is
    normal; dropping them silently corrupts corpus statistics and
    auditing them later needs the original bytes — so the quarantine
    side keeps the raw line for repair/replay, and the good side is
    schema-clean. One scan serves both (Spark requires the corrupt
    column to be cached/materialized before filtering on it —
    the persist below is that requirement, not an optimization)."""
    audited = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(audited)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .transform(_track_persist)
    )
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine


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


# file-extension → (kind, mime) for the binaryFile media ingest path.
MEDIA_EXT = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Ingest raw media files via Spark's built-in `binaryFile` source into
    the multimodal MEDIA_SCHEMA shape (operators/multimodal.py): one row
    per file, content as an opaque BINARY column, kind/mime derived from
    the extension, width/height/duration left null until a decode pass
    fills them.

    Scale notes: binaryFile reads whole files as single rows — partition
    count follows file count (maxPartitionBytes caps bin-packing of small
    files), so pair with `repartition_for_media` before any decode stage;
    `media_id = xxhash64(relative file name)` is deterministic across
    re-ingests of the same tree, making downstream dedup/joins stable.
    Unknown extensions map to kind='other', mime='application/octet-stream'
    rather than erroring — corpus crawls always carry stragglers."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind_map = F.create_map(
        *[F.lit(x) for kv in MEDIA_EXT.items() for x in (kv[0], kv[1][0])]
    )
    mime_map = F.create_map(
        *[F.lit(x) for kv in MEDIA_EXT.items() for x in (kv[0], kv[1][1])]
    )
    # media_id hashes the path RELATIVE to the ingest root (not just the
    # basename — two `cover.jpg` in different subdirs must not collide),
    # after stripping the URI scheme; stable across re-ingests of the tree.
    root_abs = os.path.abspath(path).lstrip("/")
    rel = F.regexp_replace(
        F.col("path"),
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?/*" + re.escape(root_abs) + "/+",
        "",
    )
    return raw.select(
        F.xxhash64(rel).alias("media_id"),
        F.coalesce(kind_map[ext], F.lit("other")).alias("kind"),
        F.col("content"),
        F.coalesce(mime_map[ext], F.lit("application/octet-stream")).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def read_text_docs(
    spark: SparkSession,
    path: str,
    whole_file: bool = True,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Ingest raw .txt corpora via Spark's built-in `text` source into the
    documents shape (doc_id, text, source): the entry format for corpus
    pipelines whose upstream is a crawl dump or flat-file export, before
    anything lands in parquet.

    whole_file=True (default): one document per file, `doc_id =
    xxhash64(path relative to the ingest root)` — same stable-id contract
    as read_media_dir, so re-ingests and downstream dedup keys agree.
    whole_file=False: one document per LINE (the JSONL-adjacent layout
    some exports use); the id hashes (relative path, line text) — two
    identical lines in one file collide deliberately (they are exact
    duplicates; the dedup_exact pass collapses them anyway).

    Scale notes: the text source is line-splittable in per-line mode, so
    scans parallelize within files; in whole-file mode partitioning
    follows file count (same caveat as binaryFile — compact small files
    after landing). `source` is the first path segment under the root,
    giving the per-crawl provenance column the mixture/contamination
    operators key on."""
    reader = spark.read.format("text").option("wholetext", str(whole_file).lower())
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path).select(
        F.col("value").alias("text"),
        F.col("_metadata.file_path").alias("__path"),
    )
    root_abs = os.path.abspath(path).lstrip("/")
    rel = F.regexp_replace(
        F.col("__path"),
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?/*" + re.escape(root_abs) + "/+",
        "",
    )
    id_expr = (
        F.xxhash64(rel) if whole_file else F.xxhash64(rel, F.col("text"))
    )
    return raw.select(
        id_expr.alias("doc_id"),
        F.col("text"),
        F.split_part(rel, F.lit("/"), F.lit(1)).alias("source"),
    )
