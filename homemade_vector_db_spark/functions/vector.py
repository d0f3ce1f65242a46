"""Vector distance kernels as Catalyst column expressions.

The reference computes squared-L2 inside native index libraries
(/root/reference/local_db.py:170,174 — hnswlib space='l2' and FAISS
IndexFlatL2 both return *squared* euclidean) and maps distance→similarity
as ``1/(1+d)`` (/root/reference/local_db.py:172,176).

Here the same kernels are pure column expressions over ARRAY<FLOAT>
(`zip_with` + `aggregate` higher-order functions), which keeps them inside
whole-stage codegen — no Python boundary, no UDF. All arithmetic is DOUBLE
so results are bit-comparable with the DuckDB oracle.

For very wide vectors (≥ ~1k dims) a pandas_udf + numpy BLAS kernel can beat
the HOF expression; `squared_l2_pandas` provides that path. The HOF version
is the default because it is deterministic (strict left-to-right summation)
and shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    """Cast ARRAY<FLOAT> → ARRAY<DOUBLE> so accumulation happens in f64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def squared_l2(a: Column | str, b: Column | str) -> Column:
    """Σ (aᵢ-bᵢ)² with strict left-to-right summation (deterministic)."""
    diffs = F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def squared_l2_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Σ (aᵢ-bᵢ)² expanded to `dim` scalar terms, left-associated.

    The HOF form (`aggregate(zip_with(...))`) is CodegenFallback in Spark —
    it evaluates interpreted, outside whole-stage codegen. For a known dim,
    expanding to element_at terms keeps the kernel in generated code
    (~5-10× on scan-heavy plans). Left-association preserves the exact
    summation order of the sequential HOF fold, so results are
    bit-identical and oracle checks are unaffected.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    expr = None
    for i in range(1, dim + 1):
        d = F.element_at(ca, i).cast("double") - F.element_at(cb, i).cast("double")
        term = d * d
        expr = term if expr is None else expr + term
    return expr


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Codegen-friendly fixed-dim dot product (see squared_l2_fixed)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    expr = None
    for i in range(1, dim + 1):
        term = F.element_at(ca, i).cast("double") * F.element_at(cb, i).cast("double")
        expr = term if expr is None else expr + term
    return expr


def cosine_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    na = F.sqrt(dot_fixed(a, a, dim))
    nb = F.sqrt(dot_fixed(b, b, dim))
    return F.when((na > 0) & (nb > 0), dot_fixed(a, b, dim) / (na * nb)).otherwise(
        F.lit(0.0)
    )


def l2_to_similarity(dist: Column) -> Column:
    """The reference's distance→similarity transform 1/(1+d)
    (/root/reference/local_db.py:172,176)."""
    return F.lit(1.0) / (F.lit(1.0) + dist)


def squared_l2_pandas():
    """Arrow-batched numpy kernel for the same squared-L2, for wide vectors.

    Returns a pandas_udf (ARRAY<FLOAT>, ARRAY<FLOAT>) -> DOUBLE. Batch
    transfer via Arrow; numpy does the row-block reduction. Use only when
    profiling shows the HOF expression is the bottleneck — the HOF stays
    JVM-side and is usually faster for dims ≤ a few hundred.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _sq_l2(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.to_numpy()).astype("float64")
        bm = np.stack(b.to_numpy()).astype("float64")
        d = am - bm
        return pd.Series(np.einsum("ij,ij->i", d, d))

    return _sq_l2


# ---------------------------------------------------------------------------
# Literal-query kernels as ONE parsed SQL string.
#
# Composing a 64-dim distance from pyspark Column objects costs hundreds of
# py4j round-trips (~0.9 s per query on this box — 10× the actual execution
# time of the scan it feeds). Building the same expression as a single SQL
# string and parsing it with F.expr is one round-trip. Values are identical
# bit-for-bit with the Column forms:
#  - query constants are embedded as CAST('<repr>' AS DOUBLE): repr()
#    round-trips doubles exactly and Double.parseDouble restores them
#    exactly, the same value F.lit() would ship;
#  - `a + b + c` parses left-associated, matching the sequential fold of
#    squared_l2_fixed/dot_fixed (same summation order ⇒ same fp result).
# The PCA projection (operators/pca.py) established this pattern; these are
# the shared builders for the query-vector hot path.
# ---------------------------------------------------------------------------


def _elem_d(vec_col: str, i: int) -> str:
    return f"CAST(element_at({vec_col}, {i}) AS DOUBLE)"


def _lit_d(v: float) -> str:
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def squared_l2_lit(vec_col: str, q: "Sequence[float]") -> Column:
    """Σ (xᵢ-qᵢ)² against a literal query, as one parsed expression."""
    terms = []
    for i, v in enumerate(q, start=1):
        d = f"({_elem_d(vec_col, i)} - {_lit_d(v)})"
        terms.append(f"{d} * {d}")
    return F.expr(" + ".join(terms))


def dot_lit(vec_col: str, q: "Sequence[float]") -> Column:
    """Σ xᵢ·qᵢ against a literal query, as one parsed expression."""
    terms = [
        f"{_elem_d(vec_col, i)} * {_lit_d(v)}" for i, v in enumerate(q, start=1)
    ]
    return F.expr(" + ".join(terms))


def dot_self(vec_col: str, dim: int) -> Column:
    """Σ xᵢ² (squared row norm), as one parsed expression."""
    terms = [
        f"{_elem_d(vec_col, i)} * {_elem_d(vec_col, i)}"
        for i in range(1, dim + 1)
    ]
    return F.expr(" + ".join(terms))


def qnorm_py(q: "Sequence[float]") -> float:
    """Driver-side ‖q‖ with the SAME left-associated double fold as the
    JVM constant-folding of sqrt(dot_fixed(qvec, qvec)) — bit-identical."""
    import math

    acc = 0.0
    for v in q:
        fv = float(v)
        acc = acc + fv * fv
    return math.sqrt(acc)
