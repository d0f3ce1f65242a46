"""Sample-trained PCA projection for the embedding tier.

Dimensionality reduction ahead of ANN/quantization is the standard
recipe (FAISS's PCAMatrix / OPQ pre-rotation): train a small projection
on a bounded sample, apply it distributed. The reference engine has no
training step at all (it stores raw vectors, local_db.py:37); this is
part of the similarity-search scale path layered on top.

Split of labor, same as the IVF/PQ quantizers (operators/ann.py:94,
pq.py): TRAINING is driver-side numpy SVD on a deterministic
hash-ordered sample (bounded 20k rows — orders of magnitude below the
corpus, the FAISS strategy), APPLICATION is distributed and tiered on
kernel width: literal codegen dot products while the expression fits a
janino method, Arrow-batched BLAS gemm beyond (see CODEGEN_MAX_TERMS) —
no shuffle either way, scan-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SAMPLE_LIMIT = 20_000


def fit_pca(
    df: DataFrame,
    dim_in: int,
    dim_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = SAMPLE_LIMIT,
    return_singular_values: bool = False,
):
    """(mean[dim_in], components[dim_out, dim_in]) from a deterministic
    hash-ordered sample (TakeOrderedAndProject, never a full sort).
    numpy SVD is deterministic for a fixed sample; component sign is
    normalized (first nonzero coordinate positive) so the transform is
    reproducible across BLAS builds. With `return_singular_values` a
    third element carries the sample singular values for the kept
    components (the per-direction variance signal OPQ's balanced
    subspace allocation needs, operators/opq.py)."""
    sample = (
        df.select(vec_col, F.xxhash64(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(sample_limit)
        .collect()
    )
    X = np.asarray([r[0] for r in sample], dtype="float64")
    mean = X.mean(axis=0)
    _, svals, vt = np.linalg.svd(X - mean, full_matrices=False)
    comps = vt[:dim_out]
    for i in range(comps.shape[0]):
        nz = np.flatnonzero(np.abs(comps[i]) > 1e-12)
        if nz.size and comps[i, nz[0]] < 0:
            comps[i] = -comps[i]
    if return_singular_values:
        return mean, comps, svals[:dim_out]
    return mean, comps


# Whole-stage codegen inlines the entire projection into one janino
# method (columnar input leaves no split points), and the JVM caps a
# method at 64 KB of bytecode: a 16×64 = 1024-term multiply-add chain
# does NOT compile (janino "Code grows beyond 64 KB") and Spark silently
# falls back to interpreted evaluation — a whole-scan slowdown at 100 TB.
# 512 terms compiles with ample margin (contract-tested with
# spark.sql.codegen.fallback=false in tests/test_plans.py), so wider
# kernels take the Arrow tier below instead.
CODEGEN_MAX_TERMS = 512


def project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "proj",
    max_codegen_terms: int = CODEGEN_MAX_TERMS,
) -> DataFrame:
    """Append `out_col ARRAY<DOUBLE>` = components @ (vec - mean).

    Two execution tiers, dispatched on kernel width (dim_out × dim_in):

    - ≤ max_codegen_terms: pure column expressions — each output
      coordinate is one fixed-dim dot against a literal row of
      `components`, with the constant offset (components @ mean) folded
      driver-side. Stays inside whole-stage codegen; zero Python.
    - wider: Arrow-batched matmul — (X - mean) @ componentsᵀ as one BLAS
      gemm per Arrow batch (the FAISS PCAMatrix execution shape). A wide
      kernel overflows janino's 64 KB method limit as a single codegen
      expression (see CODEGEN_MAX_TERMS), and at that width a batched
      gemm beats a thousand scalar codegen ops per row anyway.
    """
    if components.shape[0] * components.shape[1] <= max_codegen_terms:
        return _project_codegen(df, mean, components, vec_col, out_col)
    return _project_arrow(df, mean, components, vec_col, out_col)


def _project_codegen(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str,
    out_col: str,
) -> DataFrame:
    """Literal-kernel tier. The expression is assembled as ONE SQL string
    and parsed JVM-side: building the same tree from dim_out×dim_in
    individual F.lit/Column ops costs thousands of py4j round-trips
    (~10 s of driver time for 16×64)."""
    dim_in = components.shape[1]
    offsets = components @ mean  # fold the centering into a constant
    coords = []
    for j in range(components.shape[0]):
        terms = " + ".join(
            f"element_at({vec_col}, {i + 1}) * ({float(components[j, i])!r}D)"
            for i in range(dim_in)
        )
        coords.append(f"({terms}) - ({float(offsets[j])!r}D)")
    return df.withColumn(out_col, F.expr("array(" + ", ".join(coords) + ")"))


def _project_arrow(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str,
    out_col: str,
) -> DataFrame:
    """Arrow tier: one float64 gemm per Arrow batch. mean/components ride
    in the serialized closure (KB-scale), so executors pay no per-row
    Python cost beyond the Arrow column transfer."""
    mu = np.asarray(mean, dtype="float64")
    ct = np.asarray(components, dtype="float64").T  # (dim_in, dim_out)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(batch: pd.Series) -> pd.Series:
        X = np.array(batch.tolist(), dtype="float64")  # (n, dim_in)
        Y = (X - mu) @ ct
        return pd.Series(Y.tolist())

    return df.withColumn(out_col, _proj(F.col(vec_col)))
