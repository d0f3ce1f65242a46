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
