"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, ACL).

The vendored merges table (functions/bpe_merges.txt) is trained by the
driver-side scripts/train_bpe.py; this module is the same algorithm
re-expressed for a corpus that does not fit one machine. The key scale
fact of BPE training is that after the word count, NOTHING is
corpus-sized: the working state is the distinct-word vocabulary
(``(word-symbols, freq)``), which is sublinear in corpus bytes (a 100-TB
web corpus has ~1e8-1e9 distinct words vs ~1e13 tokens). So:

- stage 1 (corpus-scale, once): tokenize + explode + groupBy(word) —
  one shuffle on the word key, identical tokenizer law to
  functions.text.tokenize (split \\s+, drop empties).
- stage 2 (vocabulary-scale, per merge round): adjacent-pair counts via
  a higher-order-function explode over the symbol arrays (JVM codegen,
  no Python), ONE argmax row collected per round (O(1) driver state —
  the driver never holds the vocabulary), and the merge applied to the
  symbol arrays with a fold (F.aggregate) — also pure JVM.

Fold-left merge == the reference's skip-2 loop, provably: within one
round only the exact pair (a, b) merges, and the merged symbol a+b can
never equal a (b is non-empty), so a freshly-merged element can never be
the LEFT side of another merge of the same pair — which is exactly what
i += 2 enforces. pytest pins the distributed trainer bit-for-bit against
the vendored scripts/train_bpe.py output on the same corpus.

Determinism: merge choice is (count desc, pair lexicographic asc) — ties
identical to the reference trainer (Python tuple min on (-count, pair);
UTF-8 byte order == code-point order, so Spark's binary string sort
matches). Counts are exact BIGINTs, so partial-aggregation order can
never flip the argmax.

Lineage: each round rewrites the vocabulary relation; localCheckpoint
every few rounds truncates the plan (the nndescent.py pattern — without
it the analyzer re-walks an O(n_merges)-deep tree every round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from homemade_vector_db_spark.functions.text import tokenize

CHECKPOINT_EVERY = 8


def char_split(col: str) -> "F.Column":
    """Split a string column into CODE POINTS, JVM-side.

    A zero-width-lookaround `F.split` operates on UTF-16 units and
    breaks surrogate pairs in half (a lone high surrogate is not the
    character the reference trainer's `tuple(word)` sees — Python
    strings and DuckDB substring() are both code-point-based).
    `regexp_extract_all` with Java's `.` matches one full code point,
    so all three engines agree on any input, including non-BMP
    (emoji/astral-plane) text."""
    return F.expr(f"regexp_extract_all({col}, '(?s).', 0)")


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the ONLY corpus-scale pass of BPE training."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol arrays, freq-weighted.

    transform over sequence(0, size-2) builds the pair structs in codegen;
    words of length 1 contribute nothing (empty sequence).
    """
    pairs = F.expr(
        "transform(sequence(0, size(syms) - 2), "
        "i -> struct(syms[i] AS a, syms[i + 1] AS b))"
    )
    return (
        vocab.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every adjacent (a, b) into a+b inside the symbol arrays —
    one fold per word, all JVM-side (see module docstring for the
    fold == skip-2 proof)."""
    merged = F.lit(a + b)
    a_lit, b_lit = F.lit(a), F.lit(b)
    folded = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_lit)
            & (x == b_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.select(folded.alias("syms"), "freq")


def train_bpe_reference(
    freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side pure-Python twin (the scripts/train_bpe.py algorithm
    verbatim) — the in-plan gate q_bpe_train_check compares the
    distributed trainer against this on the same word-frequency table
    (vocabulary-sized, so the comparison is cheap at any corpus size)."""
    vocab: dict[tuple[str, ...], int] = {tuple(w): c for w, c in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def train_bpe_distributed(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn the first `n_merges` BPE merges from a corpus DataFrame.

    Returns the ranked merge list (rank = list order), bit-identical to
    scripts/train_bpe.py on the same corpus. Driver state: one argmax
    row per round; the vocabulary itself stays distributed.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    vocab = word_freq_table(docs, text_col).select(
        char_split("word").alias("syms"), "freq"
    )
    # JVM-side code-point split; boundary law concat(syms) == word and
    # the non-BMP (surrogate-pair) case are both pytest-pinned.
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = _apply_merge(vocab, a, b)
        if (r + 1) % CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges
