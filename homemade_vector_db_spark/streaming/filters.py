"""Stateless corpus-cleaning transforms for Structured Streaming ingest.

The reference ingests text verbatim (add(), local_db.py:56-75); a
production training-data pipeline cleans at the ingest boundary instead of
rewriting the corpus later. Everything here is a STATELESS column
transform, so it applies identically to batch DataFrames and streaming
DataFrames (no watermark, no state store, no microbatch coupling) — the
same `clean_docs` call is used by the batch corpus_prep path and the
`writeStream` pipelines in tests/test_streaming.py.

At 100 TB / 1000 executors: scan-side codegen projections and filters
only — the cleaning adds zero shuffles to the ingest path, and Spark can
fuse it with the sink write in one stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from homemade_vector_db_spark.functions.text import scrub_pii, tokenize

MIN_TOKENS = 3
MAX_TOP_WORD_FRAC = 0.5


def quality_mask(
    text_col: str = "text",
    min_tokens: int = MIN_TOKENS,
    max_top_word_frac: float = MAX_TOP_WORD_FRAC,
) -> Column:
    """Boolean keep-mask: enough tokens, and no single token dominating
    (the cheapest Gopher-style degenerate-text rejections), computed as
    pure array expressions — usable in both batch and streaming plans."""
    toks = tokenize(text_col)
    n = F.size(toks)
    # max term frequency via sort+fold over the token array: no explode,
    # no shuffle — counts runs of equal tokens in one pass
    sorted_toks = F.array_sort(toks)
    max_run = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return (n >= min_tokens) & (
        max_run.cast("double") / n.cast("double") <= max_top_word_frac
    )


def clean_docs(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = MIN_TOKENS,
    max_top_word_frac: float = MAX_TOP_WORD_FRAC,
) -> DataFrame:
    """Scrub PII and drop degenerate docs — the streaming-safe ingest
    cleaner. Returns the input schema with `text` redacted plus a
    `n_tokens` column (post-scrub token count, what a tokenizer budget
    downstream would see)."""
    kept = df.where(quality_mask(text_col, min_tokens, max_top_word_frac))
    scrubbed = kept.withColumn(text_col, scrub_pii(text_col))
    return scrubbed.withColumn("n_tokens", F.size(tokenize(text_col)))


def attach_clean_stream(
    stream: DataFrame,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
):
    """writeStream wiring: clean → append parquet. Stateless, so the
    query needs no watermark and restarts resume exactly from the
    checkpoint offsets (the parquet sink is exactly-once per batch via
    the sink's own transaction log)."""
    cleaned = clean_docs(stream, text_col)
    return (
        cleaned.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
