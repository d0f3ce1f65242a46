"""Distributed BPE training (operators/bpetrain.py) — pinned bit-for-bit
against the vendored scripts/train_bpe.py output on the same corpus."""

import pytest
from pyspark.sql import functions as F

from homemade_vector_db_spark.operators.bpetrain import (
    train_bpe_distributed,
    train_bpe_reference,
    word_freq_table,
)
from homemade_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


def test_distributed_matches_vendored_merges(spark, docs):
    # the vendored functions/bpe_merges.txt was trained by the
    # driver-side scripts/train_bpe.py on this exact corpus; the
    # distributed loop must reproduce all 32 merges in order
    from homemade_vector_db_spark.functions.text import load_bpe_merges

    got = train_bpe_distributed(docs, 32)
    assert got == load_bpe_merges()


def test_reference_twin_agrees_on_same_freqs(spark, docs):
    # the in-plan gate's two sides: distributed loop vs pure-Python twin
    # on the identical word-frequency table
    freqs = {r["word"]: r["freq"] for r in word_freq_table(docs).collect()}
    assert train_bpe_distributed(docs, 7) == train_bpe_reference(freqs, 7)


def test_char_split_boundary_law(spark, docs):
    # the code-point split must decompose every word into its exact
    # characters: concat(syms) == word, size(syms) == length(word)
    from homemade_vector_db_spark.operators.bpetrain import char_split

    vocab = word_freq_table(docs).select(
        "word", char_split("word").alias("syms")
    )
    bad = vocab.where(
        (F.concat_ws("", "syms") != F.col("word"))
        | (F.size("syms") != F.length("word"))
    ).count()
    assert bad == 0


def test_char_split_code_points_not_utf16_units(spark):
    # non-BMP input (surrogate pair in UTF-16): the split must yield
    # whole code points exactly like the reference trainer's tuple(word)
    # — a lookaround F.split breaks the pair into two lone surrogates
    from homemade_vector_db_spark.operators.bpetrain import (
        char_split,
        train_bpe_distributed,
        train_bpe_reference,
    )

    w = "a\U0001F600b"
    d = spark.createDataFrame([(w,)], "word string")
    syms = d.select(char_split("word").alias("s")).first().s
    assert syms == list(w)  # ['a', emoji, 'b'] — 3 code points
    docs = spark.createDataFrame(
        [(1, f"{w} {w} xy xy xy")], "doc_id long, text string"
    )
    got = train_bpe_distributed(docs, 3)
    want = train_bpe_reference({w: 2, "xy": 3}, 3)
    assert got == want and ("a", "\U0001F600") in got


def test_n_merges_validation(spark, docs):
    with pytest.raises(ValueError):
        train_bpe_distributed(docs, -1)
    assert train_bpe_distributed(docs, 0) == []
