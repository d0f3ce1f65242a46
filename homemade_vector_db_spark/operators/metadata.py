"""Metadata query — reference `query_metadata` (/root/reference/local_db.py:276-321).

Reference semantics:
- mode 1: `conditions` dict → conjunctive equality `all(meta.get(k)==v)`
  (/root/reference/local_db.py:306-309);
- mode 2 (only if no conditions): arbitrary Python `filter_func`
  (/root/reference/local_db.py:310-312) — `conditions` silently shadows it;
- mode 3: neither → all ids;
- then POSITIONAL top_k: the first k ids in doc_id order, not ranked
  (/root/reference/local_db.py:317-319), applied only when 0 < k < n.

Spark-first: a conditions dict compiles to native column equality predicates
(`col(k) == lit(v)`) which push down to the parquet scan — `.explain` shows
them in PushedFilters, so at 100 TB row groups whose min/max excludes the
value are never read. `filter_func` falls back to a Python UDF and is
documented as the slow path (no pushdown).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def conditions_to_predicate(conditions: Mapping[str, Any]) -> Column:
    """Conjunctive equality over promoted metadata columns.

    `meta.get(k) == v` semantics: a NULL column value never equals v,
    matching the reference's `None == v` → False.
    """
    pred = F.lit(True)
    for key, value in conditions.items():
        pred = pred & (F.col(key) == F.lit(value))
    return pred


def query_metadata(
    df: DataFrame,
    conditions: Mapping[str, Any] | None = None,
    filter_func: Callable[[dict], bool] | None = None,
    top_k: int | None = None,
    id_col: str = "doc_id",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """Returns matching ids in id order, positionally truncated to top_k."""
    if conditions:
        df = df.where(conditions_to_predicate(conditions))
    elif filter_func is not None:
        cols = meta_cols or [c for c in df.columns if c != id_col]
        pred_udf = F.udf(
            lambda *vals: bool(filter_func(dict(zip(cols, vals)))), BooleanType()
        )
        df = df.where(pred_udf(*[F.col(c) for c in cols]))
    out = df.select(id_col).orderBy(F.asc(id_col))
    if top_k is not None and top_k > 0:
        out = out.limit(top_k)
    return out
