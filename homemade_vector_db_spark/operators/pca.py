"""Sample-trained PCA projection for the embedding tier.

Dimensionality reduction ahead of ANN/quantization is the standard
recipe (FAISS's PCAMatrix / OPQ pre-rotation): train a small projection
on a bounded sample, apply it distributed. The reference engine has no
training step at all (it stores raw vectors, local_db.py:37); this is
part of the similarity-search scale path layered on top.

Split of labor, same as the IVF/PQ quantizers (operators/ann.py:94,
pq.py): TRAINING is driver-side numpy SVD on a deterministic
hash-ordered sample (bounded 20k rows — orders of magnitude below the
corpus, the FAISS strategy), APPLICATION is a distributed pure-codegen
projection: dim_out fixed-dim dot products against literal component
vectors — no UDF, no shuffle, scan-side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_LIMIT = 20_000


def fit_pca(
    df: DataFrame,
    dim_in: int,
    dim_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = SAMPLE_LIMIT,
) -> tuple[np.ndarray, np.ndarray]:
    """(mean[dim_in], components[dim_out, dim_in]) from a deterministic
    hash-ordered sample (TakeOrderedAndProject, never a full sort).
    numpy SVD is deterministic for a fixed sample; component sign is
    normalized (first nonzero coordinate positive) so the transform is
    reproducible across BLAS builds."""
    sample = (
        df.select(vec_col, F.xxhash64(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(sample_limit)
        .collect()
    )
    X = np.asarray([r[0] for r in sample], dtype="float64")
    mean = X.mean(axis=0)
    _, _, vt = np.linalg.svd(X - mean, full_matrices=False)
    comps = vt[:dim_out]
    for i in range(comps.shape[0]):
        nz = np.flatnonzero(np.abs(comps[i]) > 1e-12)
        if nz.size and comps[i, nz[0]] < 0:
            comps[i] = -comps[i]
    return mean, comps


def project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Append `out_col ARRAY<DOUBLE>` = components @ (vec - mean).

    Pure column expressions: each output coordinate is one fixed-dim dot
    against a literal row of `components`, with the constant offset
    (components @ mean) folded driver-side — so the per-row work is
    exactly dim_out × dim_in codegen multiply-adds. The expression is
    assembled as ONE SQL string and parsed JVM-side: building the same
    tree from dim_out×dim_in individual F.lit/Column ops costs thousands
    of py4j round-trips (~10 s of driver time for 16×64)."""
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
