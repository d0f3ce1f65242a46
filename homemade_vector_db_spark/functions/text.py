"""Tokenizer with exact parity to the reference's ``str.split()``.

The reference tokenizes with Python ``doc.split()`` everywhere
(/root/reference/local_db.py:74,129,257,351): splits on runs of any
whitespace, drops empty strings, is case-SENSITIVE, does no punctuation
stripping or stemming (/root/reference/README.md:144).

Spark's ``split(text, '\\s+')`` keeps a leading empty string when the input
starts with whitespace, so we filter empties — that makes the two exactly
equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize(col: Column | str) -> Column:
    """ARRAY<STRING> of tokens, exact `str.split()` semantics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def tokenize_expr(colname: str) -> str:
    """SQL-string form of `tokenize` for spark.sql() call sites."""
    return f"filter(split({colname}, '\\\\s+'), t -> t != '')"


def py_tokenize(text: str) -> list[str]:
    """Driver-side twin used for query strings (parity with local_db.py:129)."""
    return text.split()


# ----------------------------------------------------------------- BPE
# Real merge-based byte-pair encoding (Sennrich et al. 2016). The merges
# table is VENDORED (bpe_merges.txt, trained by scripts/train_bpe.py on
# the fixture corpus, rank = line order) so the Spark encoder and the
# DuckDB recursive-CTE oracle consume the identical table. Encoding is
# the standard greedy loop: repeatedly find the lowest-rank merge whose
# pair occurs in the word, merge ALL its non-overlapping occurrences
# left-to-right, stop when no merge applies. No end-of-word marker —
# word-internal merges only, which keeps both implementations in exact
# lockstep (documented in scripts/train_bpe.py).

import os as _os

_MERGES_PATH = _os.path.join(_os.path.dirname(__file__), "bpe_merges.txt")


def load_bpe_merges() -> list[tuple[str, str]]:
    """The vendored merges in rank order."""
    with open(_MERGES_PATH) as f:
        return [tuple(line.rstrip("\n").split(" ", 1)) for line in f if line.strip()]


def bpe_encode(word: str, ranks: dict[tuple[str, str], int],
               merges: list[tuple[str, str]]) -> list[str]:
    """Greedy min-rank BPE encoding of one word (driver/executor Python).

    Runs only over the COMPACT distinct-word relation (see
    queries._bpe_word_pieces) — never over corpus-scale rows — so the
    Python cost is O(vocab), not O(tokens), and at 100 TB the corpus-scale
    work stays as JVM joins against the encoded vocabulary.
    """
    syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = merges[best]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# PII patterns kept to the common subset of Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround, so the same literal string
# runs on both engines and in the oracle SQL.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\+?\d[\d()\- ]{7,14}\d\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern in a string column.

    Pure JVM path: `regexp_extract_all` + `size`, no UDF — at 100 TB this
    is a scan-side projection inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def scrub_pii(col: Column | str, replacement: str = "[PII]") -> Column:
    """Redact all known PII patterns from a string column.

    Chained `regexp_replace` (one pass per pattern class), the standard
    pre-training scrub step. The reference has no text-cleaning operators
    at all (local_db.py stores text verbatim); this is part of the
    LLM-pipeline surface this engine adds on top.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, replacement)
    return c
