"""Text-analysis operators for training-data pipelines.

All pure column expressions (whole-stage codegen, no UDFs): token counting,
quality scoring, language-ID heuristic, document fingerprinting. Each is a
narrow per-row map — embarrassingly parallel, no shuffle at any scale
(except the optional aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from homemade_vector_db_spark.functions.text import tokenize

STOPWORDS = ["the", "a"]

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible; not a real lang detector.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "with"],
    "es": ["el", "la", "los", "de", "con"],
    "fr": ["le", "la", "les", "de", "avec"],
    "de": ["der", "die", "das", "und", "mit"],
    "zh": ["的", "是", "在", "和", "了"],
}


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(text_col)).alias("n_tokens"),
    ).orderBy("doc_id")


def quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nchars_col: str = "n_chars",
) -> DataFrame:
    """Per-doc quality signals: token count, average token length,
    stopword ratio, type-token ratio. Columns aliased to match the oracle."""
    toks = tokenize(text_col)
    n = F.size(toks).cast("double")
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.round(F.col(nchars_col).cast("double") / n, 6).alias("avg_token_len"),
        F.round(stop / n, 6).alias("stopword_ratio"),
        F.round(uniq / n, 6).alias("type_token_ratio"),
    ).orderBy("doc_id")


def lang_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-hit language-ID heuristic: argmax of marker hits, ties by
    language code ascending, zero hits → 'und'."""
    toks = tokenize(text_col)
    scores = [
        F.struct(
            (-F.size(F.filter(toks, lambda t: t.isin(words)))).alias("neg_hits"),
            F.lit(code).alias("code"),
        )
        for code, words in sorted(LANG_MARKERS.items())
    ]
    # struct sort is lexicographic (neg_hits asc, code asc) → [0] is the
    # argmax by hits with ties broken by language code ascending.
    best = F.array_sort(F.array(*scores))[0]
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["neg_hits"] < 0, best["code"]).otherwise(F.lit("und")).alias("pred_lang"),
    ).orderBy("doc_id")


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document fingerprints:
    - md5_fp: md5 of whitespace-normalized text (oracle-friendly);
    - roll_fp: polynomial rolling hash over tokens mod 2^61-1 (the classic
      Rabin-Karp-style fingerprint, pure column expr)."""
    toks = tokenize(text_col)
    norm = F.concat_ws(" ", toks)
    p = (1 << 61) - 1
    roll = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(1_000_003) + F.pmod(F.xxhash64(t), F.lit(p)), F.lit(p)
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("md5_fp"),
        roll.alias("roll_fp"),
    ).orderBy("doc_id")
